package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-sweep analytics: operators over (start, end) interval tables —
  * session spans, SCD2 validity windows, job runtimes. The core trick is
  * the ±1 endpoint sweep: an interval becomes a +1 at its start and a −1
  * past its end, and the running sum over the global endpoint order is the
  * number of concurrently-open intervals at every instant.
  *
  * The global order is the scale hazard — a single ORDER-BY window over
  * all endpoints serializes the data through one partition. Here it is
  * BANDED (the q141 distributed-prefix-sum discipline): endpoints sort
  * within their UTC day partition only, and a |days|-row broadcast of
  * cumulative prior-day deltas shifts each band to its global offset.
  * Intervals spanning band boundaries need no special case: their +1 sits
  * in an earlier band and reaches later bands through the offset.
  */
object Intervals {

  /** Peak concurrent open intervals per UTC day.
    *
    * Input: one row per interval; `sCol`/`eCol` are epoch-MICROSECOND
    * longs with s ≤ e. Boundaries are inclusive: an interval is open at
    * both its start and end instants, and at equal timestamps starts are
    * processed before ends (so a zero-length interval still counts 1).
    * Output: (day string "yyyy-MM-dd", peak long) for each day containing
    * at least one endpoint, ordered by day.
    *
    * Determinism: tie order among equal (t, delta) endpoints cannot move
    * a day's max — the running sum is monotone along a run of equal
    * deltas, so the run's extremum is reached at its last element no
    * matter how the run is permuted.
    */
  def dailyConcurrencyPeaks(intervals: DataFrame, sCol: String, eCol: String): DataFrame = {
    // endpoints via explode, not a union of two projections — a union
    // would recompute the (possibly expensive) interval derivation twice
    val pts = intervals.select(explode(array(
        struct(col(sCol).as("t"), lit(1L).as("d")),
        struct(col(eCol).as("t"), lit(-1L).as("d")))).as("p"))
      .select(col("p.t").as("t"), col("p.d").as("d"))
      .withColumn("day", date_format(timestamp_micros(col("t")), "yyyy-MM-dd"))
    val offs = pts.groupBy(col("day")).agg(sum(col("d")).as("ds"))
      .withColumn("off", coalesce(
        sum(col("ds")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("day"), col("off"))
    val wd = Window.partitionBy(col("day")).orderBy(col("t"), col("d").desc)
    pts.join(broadcast(offs), Seq("day"))
      .withColumn("run", col("off") + sum(col("d")).over(
        wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("day"))
      .agg(max(col("run")).as("peak"))
      .orderBy(col("day"))
  }
}
