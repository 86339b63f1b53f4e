package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Text, Vectors}

/** Measurement harness behind SCALE.md's flagged-query analysis: the 10×
  * growth bench (sf0.1 → sf1) flags queries past the 15× budget, and this
  * probe turns the explanations/fixes into numbers on the actual data:
  *
  *  - q41 (embedding near-dup): candidate-pair volume, verified pairs,
  *    wall time, and recall against the brute-force cos ≥ τ ground truth,
  *    per plane count (SPARK_GRAFT_PROBE_PLANES=8,12 — default 8 and
  *    [[Vectors.adaptivePlanes]]). This is the experiment that exposed
  *    the correlated arithmetic-progression lattice (plane count did not
  *    reduce candidates: 17.6 M at 8 planes, 16.9 M at 9, 13.1 M at 12,
  *    4.1 M at 20 on the 20 k-vector sf1 corpus) and validated the md5
  *    lattice that replaced it (1.85 M at 8 planes, 141 k at 12 —
  *    matching independent-hyperplane theory, so adaptive plane scaling
  *    bounds candidates linearly in corpus size).
  *
  *  - q120 (BM25): the global 75%-df stopword gate prunes the Zipf head;
  *    on a corpus of disjoint sub-vocabularies (ScaleUp's copy-suffixed
  *    tokens — 10 tenants/languages) each tenant's stopwords sit at ~10%
  *    global df and pass the gate, so candidate volume takes a ONE-TIME
  *    step up at the sf0.1 → sf1 transition (then grows linearly again).
  *    The probe reports query counts, gated query terms, and candidate
  *    rows so the step and its asymptote can be read off directly.
  *
  * Usage: sbt "runMain graft.ScaleProbe <sfDir>"
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { probeCandidates(spark, dir); probeQ41(spark, dir); probeQ120(spark, dir) }
    finally spark.stop()
  }

  /** Candidate cardinalities from the PRODUCTION seams (the exact
    * derivations the queries consume — `QueriesExt.q*Candidates`), per
    * scale factor: the structural quantities CandidateBudgetSpec asserts
    * in CI and SCALE.md cites. Unlike wall-time ratios these are
    * deterministic on any host. */
  private def probeCandidates(spark: SparkSession, dir: String): Unit = {
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    val nEmb = spark.read.parquet(s"$dir/embeddings.parquet").count()
    for ((name, df) <- Seq(
        "q31_prefix" -> QueriesExt.q31Candidates(spark, dir),
        "q32_lsh" -> QueriesExt.q32Candidates(spark, dir),
        "q41_lattice" -> QueriesExt.q41Candidates(spark, dir),
        "q167_bands" -> QueriesExt.q167Candidates(spark, dir),
        "q120_postgate" -> QueriesExt.q120Candidates(spark, dir))) {
      val (n, t0) = time(df.count())
      println(f"[cand] sf=$dir%s docs=$nDocs%d emb=$nEmb%d $name%s=$n%d (${t0}%.1fs)")
    }
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def probeQ41(spark: SparkSession, dir: String): Unit = {
    val tau = 0.4
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), Vectors.quantize(col("embedding")).as("qv"))
      .withColumn("nsq", Vectors.normSqQ(col("qv")))
      .cache()
    val n = emb0.count()
    // brute-force ground truth (broadcast one side; n² dot products):
    // the recall denominator, NOT part of any production path
    val (truth, tTruth) = time(
      emb0.as("a").join(broadcast(emb0.as("b")),
          col("a.vec_id") < col("b.vec_id"))
        .select(Vectors.cosineFromParts(
          Vectors.dotQ(col("a.qv"), col("b.qv")),
          col("a.nsq"), col("b.nsq")).as("cos"))
        .filter(col("cos") >= tau).count())
    println(f"[q41] sf=$dir%s n=$n%d truth_pairs(cos>=$tau%.1f)=$truth%d (${tTruth}%.1fs)")
    val planeCounts = sys.env.get("SPARK_GRAFT_PROBE_PLANES")
      .map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(8, Vectors.adaptivePlanes(n))).distinct
    for (planes <- planeCounts) {
      val emb = emb0
        .withColumn("b0", Vectors.lshBucketSeeded(col("qv"), planes, 0))
        .withColumn("b1", Vectors.lshBucketSeeded(col("qv"), planes, 1))
        .cache()
      emb.count() // materialize outside the timed region: the lattice cost
                  // is identical under every plane count; candidates differ
      def pairsOn(b: String) = emb.as("a")
        .join(emb.as("b"),
          col(s"a.$b") === col(s"b.$b") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("rep_id"), col("b.vec_id").as("dup_id"))
      val cand = pairsOn("b0").unionByName(pairsOn("b1")).distinct()
      val (nCand, tCand) = time(cand.count())
      val verified = cand
        .join(emb.select(col("vec_id").as("rep_id"), col("qv").as("qa"),
          col("nsq").as("na")), Seq("rep_id"))
        .join(emb.select(col("vec_id").as("dup_id"), col("qv").as("qb"),
          col("nsq").as("nb")), Seq("dup_id"))
        .select(Vectors.cosineFromParts(
          Vectors.dotQ(col("qa"), col("qb")), col("na"), col("nb")).as("cos"))
        .filter(col("cos") >= tau)
      val (nVer, tVer) = time(verified.count())
      val recall = if (truth > 0) nVer.toDouble / truth else Double.NaN
      println(f"[q41] sf=$dir%s planes=$planes%d candidates=$nCand%d " +
        f"(${tCand}%.1fs) verified=$nVer%d (${tVer}%.1fs) recall=$recall%.3f")
      emb.unpersist()
    }
    emb0.unpersist()
  }

  private def probeQ120(spark: SparkSession, dir: String): Unit = {
    val tfc = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).as("dl"),
        explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    val nDocs = tfc.select(col("doc_id")).distinct().count()
    val dfreq = tfc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = tfc.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id").as("qid"), col("term"))
    val nQueries = qterms.select(col("qid")).distinct().count()
    val qdfAll = dfreq.join(broadcast(qterms), Seq("term"))
    val qdf = qdfAll.filter(col("df") * 4 <= lit(nDocs) * 3)
    val nQTermsAll = qdfAll.count()
    val nQTermsKept = qdf.count()
    val (nCand, tCand) = time(
      tfc.join(broadcast(qdf.select(col("term"), col("qid"))), Seq("term"))
        .filter(col("doc_id") =!= col("qid")).count())
    println(f"[q120] sf=$dir%s docs=$nDocs%d queries=$nQueries%d " +
      f"qterms=$nQTermsAll%d kept_after_df_gate=$nQTermsKept%d " +
      f"candidate_rows=$nCand%d (${tCand}%.1fs)")
    tfc.unpersist()
  }
}
