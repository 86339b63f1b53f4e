package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

/** Depth leg for the storage-rotated BPE trainer (VERDICT r11 ask #3):
  * the q111 gate trains 5 merges, but the operator's claim is that a
  * REALISTIC vocabulary run — hundreds to tens of thousands of merge
  * rounds, each localCheckpointing a new pieces table — holds O(1)
  * storage, not O(merges). Pre-rotation behavior would have held one
  * pieces-table copy PER MERGE; this leg runs train() at ~100× the
  * gate's merge count on the sf1 corpus vocabulary and records the PEAK
  * persistent-RDD count observed by a 250 ms sampler thread plus the
  * wall time, writing a JSON artifact. Pass = peak stays a small
  * constant (bounded by two pieces generations + the samplers' jitter).
  *
  * Usage: `runMain graft.BpeDepth <sfDir> <nMerges> <outJson> [trigrams]`.
  * The synthetic corpus's unigram vocabulary (310 words) exhausts all
  * learnable merges near round ~400; the optional `trigrams` mode uses
  * distinct token TRIGRAMS as the word table instead — a vocabulary in
  * the tens of thousands with ~25-char entries, enough pair mass to
  * sustain 1000+ full merge rounds at a realistic per-round table size.
  */
object BpeDepth {

  def main(args: Array[String]): Unit = {
    val (sfDir, nMerges, outPath, trigrams) = args match {
      case Array(a, b, c)              => (a, b.toInt, c, false)
      case Array(a, b, c, "trigrams")  => (a, b.toInt, c, true)
      case _ => sys.error("usage: BpeDepth <sfDir> <nMerges> <outJson> [trigrams]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    // the q111 derivation: corpus → token explode → word-frequency table
    // (trigram mode: sliding token trigrams joined by "_", same shape)
    val toks = graft.core.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        filter(graft.functions.Text.tokens(col("text")), w => w =!= lit(""))
          .as("toks"))
    val words =
      (if (!trigrams)
        toks.select(explode(col("toks")).as("word"))
      else
        toks.select(explode(expr(
          """IF(size(toks) < 3, CAST(array() AS ARRAY<STRING>),
            |   transform(sequence(1, size(toks) - 2),
            |     i -> concat_ws('_', element_at(toks, CAST(i AS INT)),
            |                         element_at(toks, CAST(i + 1 AS INT)),
            |                         element_at(toks, CAST(i + 2 AS INT)))))"""
            .stripMargin)).as("word")))
        .groupBy("word").agg(count(lit(1)).as("freq"))
    val vocab = words.count()

    val peak = new AtomicInteger(0)
    val peakStorageMb = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        peak.getAndAccumulate(sc.getPersistentRDDs.size, math.max)
        val used = sc.getExecutorMemoryStatus.values
          .map { case (max, rem) => max - rem }.sum / 1048576L
        peakStorageMb.getAndAccumulate(used, math.max)
        Thread.sleep(250)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    val t0 = System.nanoTime()
    val rules = graft.operators.Bpe.train(words, nMerges)
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    sampler.join(2000)
    val endRdds = sc.getPersistentRDDs.size

    val json = String.format(java.util.Locale.ROOT,
      """{"sf":"%s","n_merges_requested":%d,"n_merges_learned":%d,
        |"vocab_words":%d,"wall_sec":%.1f,"sec_per_merge":%.3f,
        |"peak_persistent_rdds":%d,"end_persistent_rdds":%d,
        |"peak_storage_mb":%d}
        |""".stripMargin,
      sfDir, Int.box(nMerges), Int.box(rules.size), Long.box(vocab),
      Double.box(wall), Double.box(wall / math.max(1, rules.size)),
      Int.box(peak.get()), Int.box(endRdds), Long.box(peakStorageMb.get()))
    Files.writeString(Paths.get(outPath), json)
    println(s"[bpedepth] learned ${rules.size}/$nMerges merges over $vocab words " +
      s"in ${String.format(java.util.Locale.ROOT, "%.1f", Double.box(wall))}s; " +
      s"peak persistent RDDs ${peak.get()}, end $endRdds, " +
      s"peak storage ${peakStorageMb.get()}MB")
    spark.stop()
  }
}
