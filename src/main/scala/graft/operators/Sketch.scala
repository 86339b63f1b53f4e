package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches (Cormode & Muthukrishnan's count-min) for
  * the regime where the key universe itself doesn't fit anywhere: the
  * sketch is d×w counters regardless of cardinality, counters are purely
  * ADDITIVE (map-side combinable, mergeable across days/streams/shards),
  * and estimates are one-sided (est ≥ true count, the classic CMS
  * guarantee).
  *
  * Lane hashes are md5-derived from the key's string form (the
  * [[Sampling]] stable-hash discipline), so the sketch is a pure function
  * of the key MULTISET — partition-invariant and reproducible by any
  * engine that can md5 a string, which is what makes q95's independent
  * DuckDB rebuild meaningful.
  */
object Sketch {

  /** Lane-r bucket of a key: first 8 md5 hex chars of "r:key", mod w. */
  private def bucket(lane: Column, key: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(lane, lit(":"), key.cast("string"))), 1, 8),
      16, 10).cast("long"), lit(w))

  /** Build the sketch: one generator fans each row into its d lanes, one
    * map-side-combinable aggregate sums the cells. At most d·w output
    * rows no matter the input size.
    *
    * @return (lane, bucket, cnt) — only nonzero cells */
  def countMin(df: DataFrame, keyCol: String, w: Int, d: Int): DataFrame = {
    require(w >= 2 && d >= 1, s"countMin needs w >= 2, d >= 1; got w=$w d=$d")
    df.select(explode(array((0 until d).map(r =>
        struct(lit(r).as("lane"),
          bucket(lit(r), col(keyCol), w).as("bucket"))): _*)).as("lb"))
      .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for a set of probe keys: min over the d probed cells
    * (absent cell = 0). The sketch side is d·w rows — broadcast-sized by
    * construction — so probing any number of keys is one broadcast join. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      w: Int, d: Int): DataFrame = {
    val keyed = probes.select(col(keyCol), explode(array((0 until d).map(r =>
        struct(lit(r).as("lane"),
          bucket(lit(r), col(keyCol), w).as("bucket"))): _*)).as("lb"))
      .select(col(keyCol), col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
    keyed.join(broadcast(sketch), Seq("lane", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}
