package graft

import org.apache.spark.sql.functions._

/** [[SubCorpus]] hardening (ADVICE r9): directory-layout `*.parquet`
  * entries (the standard Spark output shape) must copy recursively — the
  * round-9 single-file fallback silently produced an EMPTY directory —
  * and dst == src must be rejected before anything is deleted.
  */
class ScaleSubCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("directory-layout tables copy recursively and re-runs are idempotent") {
    val src = java.nio.file.Files.createTempDirectory("subc_src").toString
    ScaleUp.writeOne(
      (0 until 50).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text"),
      s"$src/documents.parquet")
    // the standard multi-part Spark layout the r9 fallback corrupted
    (0 until 20).map(i => (i.toLong, i * 2L)).toDF("k", "v")
      .repartition(3).write.parquet(s"$src/events.parquet")
    val dst = java.nio.file.Files.createTempDirectory("subc_dst").toString
    SubCorpus.run(spark, src, dst, 10)
    assert(spark.read.parquet(s"$dst/events.parquet")
      .as[(Long, Long)].collect().sorted.toSeq ==
      (0 until 20).map(i => (i.toLong, i * 2L)))
    assert(spark.read.parquet(s"$dst/documents.parquet").count() == 10)
    // deterministic selection: same subset on a re-run
    val first = spark.read.parquet(s"$dst/documents.parquet")
      .select("doc_id").as[Long].collect().sorted.toSeq
    SubCorpus.run(spark, src, dst, 10)
    assert(spark.read.parquet(s"$dst/events.parquet").count() == 20)
    assert(spark.read.parquet(s"$dst/documents.parquet")
      .select("doc_id").as[Long].collect().sorted.toSeq == first)
  }

  test("dst == src is rejected up front on canonical paths") {
    val src = java.nio.file.Files.createTempDirectory("subc_same").toString
    ScaleUp.writeOne(Seq((1L, "t")).toDF("doc_id", "text"),
      s"$src/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      SubCorpus.run(spark, src, src + "/.", 1)
    }
    assert(e.getMessage.contains("differ"))
  }
}
