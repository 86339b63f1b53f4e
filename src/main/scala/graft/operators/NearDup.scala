package graft.operators

import graft.functions.Text
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-duplicate joins over hashed-shingle sets
  * (input: `(doc_id: bigint, hs: array<bigint>)`), as inverted-index joins —
  * never an n² cross join. Two strategies with identical answers:
  *
  *  - [[prefixJoinPairs]] (DEFAULT): PPJoin-style τ-prefix postings
  *    (Xiao et al. 2008). Each document indexes only its first
  *    (n − ⌊τ·n⌋ + 1) sorted hashes, so a boilerplate shingle shared by
  *    millions of documents enters the index only for documents whose
  *    PREFIX holds it — join volume is bounded by prefix-df², robust to
  *    shingle skew. Completeness: two sets with Jaccard ≥ τ must share a
  *    prefix element, so no pair is missed; candidates are then verified by
  *    the fused exact-Jaccard kernel over the full sets. This is the 100 TB
  *    path.
  *  - [[countJoinPairs]]: count-based postings join deriving
  *    |A∩B| by co-occurrence counting and |A∪B| = |A|+|B|−|A∩B| — no
  *    verify join at all, but join volume is Σ df² over ALL shingles:
  *    corpus-linear only while every shingle is rare. Keep for low-skew
  *    corpora where the saved verify join wins.
  */
object NearDup {

  /** Skew-robust default: prefix-filtered candidates + fused-kernel verify. */
  def prefixJoinPairs(docs: DataFrame, tau: Double): DataFrame = {
    val pref = docs.select(col("doc_id"),
      explode(Text.prefixHashes(col("hs"), tau)).as("g"))
    val cand = pref.as("a")
      .join(pref.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("hs").as("hsa")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("hs").as("hsb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        Text.jaccardFused(col("hsa"), col("hsb")).as("jac"))
      .filter(col("jac") >= tau)
  }

  /** Low-skew alternative: the whole pipeline is codegen'd
    * explode → shuffle-join → hash-aggregate with no verification pass. */
  def countJoinPairs(docs: DataFrame, tau: Double): DataFrame = {
    val posting = docs.select(col("doc_id"), size(col("hs")).as("n"),
      explode(col("hs")).as("g"))
    posting.as("a")
      .join(posting.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jac"))
      .filter(col("jac") >= tau)
  }
}
