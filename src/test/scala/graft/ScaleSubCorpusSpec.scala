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

  test("keyed mode selects whole key groups of a non-unique key") {
    // lineitem-shaped: 20 orders x 3 lines; subsetting by l_orderkey must
    // keep every line of a selected order and none of an unselected one
    val src = java.nio.file.Files.createTempDirectory("subc_ksrc").toString
    ScaleUp.writeOne(Seq((1L, "t")).toDF("doc_id", "text"),
      s"$src/documents.parquet")
    val rows = for (o <- 0L until 20L; l <- 1 to 3)
      yield (o, l, s"part_${o}_$l")
    ScaleUp.writeOne(rows.toDF("l_orderkey", "l_linenumber", "p"),
      s"$src/lineitem.parquet")
    val dst = java.nio.file.Files.createTempDirectory("subc_kdst").toString
    SubCorpus.run(spark, src, dst, 5, table = "lineitem", key = "l_orderkey")
    val got = spark.read.parquet(s"$dst/lineitem.parquet")
      .as[(Long, Int, String)].collect()
    val orders = got.map(_._1).distinct
    assert(orders.length == 5, s"expected 5 whole orders, got ${orders.toSeq}")
    assert(got.length == 15, "every selected order keeps all 3 lines")
    // the md5-stable selection matches a reference derivation
    val want = (0L until 20L)
      .sortBy(o => java.security.MessageDigest.getInstance("MD5")
        .digest(o.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
      .take(5).toSet
    assert(orders.toSet == want)
    // documents (not the subset table in this mode) hardlinks verbatim
    assert(spark.read.parquet(s"$dst/documents.parquet").count() == 1)
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
