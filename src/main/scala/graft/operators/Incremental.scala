package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a materialized aggregate
  * current by merging each new batch's PARTIAL aggregate into it, instead
  * of re-scanning history — at 100 TB the difference between touching one
  * day's partition and recomputing a year.
  *
  * Works for any decomposable (commutative-monoid) aggregate state:
  * counts, sums, min/max — re-aggregating the union of partial states
  * with the combining function yields exactly the full recompute (q84's
  * oracle proves it against the one-shot aggregate). Averages ride as
  * (sum, count) pairs; the non-decomposable ones (exact distinct,
  * percentile) need their own state (distinct key sets, histograms).
  *
  * One shuffle on the group key, sized by |groups| of the existing state
  * plus |groups| of the delta — never by history row count.
  */
object Incremental {

  /** Merge partial aggregate states sharing schema (`keys` ++ value
    * columns). `combine` maps each value column to its combining
    * function, e.g. `Map("n" -> "sum", "cents" -> "sum", "mx" -> "max")`. */
  def merge(prev: DataFrame, delta: DataFrame, keys: Seq[String],
      combine: Map[String, String]): DataFrame = {
    require(combine.nonEmpty, "no value columns to combine")
    val aggs = combine.toSeq.sortBy(_._1).map { case (c, f) =>
      expr(s"$f($c)").as(c)
    }
    prev.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
