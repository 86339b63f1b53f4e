package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running totals and training-sequence packing.
  *
  * Pretraining shards are built by CONCATENATING documents in a canonical
  * order and CHUNKING the token stream at the context length ("concat-then-
  * chunk"). The operator every variant needs is a GLOBAL prefix sum over a
  * total order — and the naive Spark form, `sum().over(Window.orderBy(id))`
  * with no partition keys, collapses the whole dataset into ONE window
  * partition: a single task owns 100 TB and the job never finishes.
  *
  * [[globalCumSum]] computes the exact same running total with bounded
  * parallelism, the classic two-phase scan:
  *
  *   1. range-bucket rows by the order column (boundaries from one
  *      `approxQuantile` probe — any boundaries give the CORRECT result,
  *      quantiles only balance the work);
  *   2. one tiny per-bucket total aggregate (B rows — a model collect, not
  *      a data collect) prefix-summed on the driver into per-bucket launch
  *      offsets, inlined as a literal map;
  *   3. a per-BUCKET window cumsum plus the bucket's offset — every window
  *      partition holds ~1/B of the data, so the scan parallelizes to B.
  *
  * The result is bit-identical to the single-partition window for ANY
  * bucket count (PackingSpec pins the invariance), because step 2's offsets
  * restore exactly what bucketing removed.
  */
object Packing {

  /** Append `cumCol` = inclusive global running total of `valueCol` in
    * `orderCol` order. `orderCol` must be numeric and globally unique —
    * the total order IS the operator's semantics; ties would make the
    * running total depend on partition luck. Output column is LongType.
    */
  def globalCumSum(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String = "cum", buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val orderType = df.schema(orderCol).dataType
    require(orderType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"globalCumSum orders by a NUMERIC column (range boundaries come from " +
        s"approxQuantile); '$orderCol' is $orderType — derive a numeric key " +
        "first (e.g. a dense surrogate id) and order by that")
    val probes = (1 until buckets).map(_.toDouble / buckets).toArray
    val bnds: Array[Double] =
      if (probes.isEmpty) Array.empty
      else df.stat.approxQuantile(orderCol, probes, 0.001).distinct.sorted
    // Bucket id = #boundaries <= value: a pure map fused into the scan
    // stage (no exchange to assign buckets) — the codegen'd comparison
    // chain, not the HOF form (see [[RangeBucket]]: ArrayFilter is
    // CodegenFallback and breaks whole-stage codegen for the stage).
    val bucket = RangeBucket.of(col(orderCol), bnds)
    val bucketed = df.withColumn("__pk_bucket", bucket)
    val v = coalesce(col(valueCol).cast("long"), lit(0L))

    // Per-bucket totals -> exclusive prefix offsets. B rows to the driver.
    val totals: Array[(Int, Long)] = bucketed
      .groupBy(col("__pk_bucket"))
      .agg(sum(v).as("t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      totals.map { case (b, t) => val o = (b, acc); acc += t; o }.toMap
    }
    val offsetExpr: Column =
      if (offsets.isEmpty) lit(0L)
      else coalesce(
        element_at(
          map(offsets.toSeq.sortBy(_._1).flatMap {
            case (b, o) => Seq(lit(b), lit(o))
          }: _*),
          col("__pk_bucket")),
        lit(0L))

    val w = Window.partitionBy(col("__pk_bucket")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn(cumCol, sum(v).over(w) + offsetExpr)
      .drop("__pk_bucket")
  }

  /** Concat-then-chunk shard assignment: documents in `orderCol` order are
    * packed into fixed-budget shards; a document belongs to the shard where
    * its FIRST token lands: shard = (cum − value) div budget. Appends
    * `cumCol` and `shardCol` (both LongType). The assignment is a pure
    * function of the global prefix sum, so it is deterministic under any
    * partitioning and any bucket count.
    */
  def packByBudget(df: DataFrame, orderCol: String, valueCol: String,
      budget: Long, shardCol: String = "shard", cumCol: String = "cum",
      buckets: Int = 64): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // `div` (integral division), not `/`: double division truncates wrong
    // for first-token offsets beyond 2^53 (a real 100 TB token count).
    globalCumSum(df, orderCol, valueCol, cumCol, buckets)
      .withColumn("__pk_first",
        col(cumCol) - coalesce(col(valueCol).cast("long"), lit(0L)))
      .withColumn(shardCol, expr(s"__pk_first div ${budget}L"))
      .drop("__pk_first")
  }

  /** EXACT concat-then-chunk spans: the trainer-facing form, where a
    * document crossing a shard boundary is SPLIT — one output row per
    * (document, shard) it overlaps, carrying the token count that lands in
    * that shard. Every shard's tokens sum to exactly `budget` except the
    * last (PackingSpec pins this), which is what "context-length chunks of
    * the concatenated stream" means. Zero-token documents vanish (they
    * occupy no interval). The expansion is a pure map + explode bounded by
    * ⌈v/budget⌉ spans per document — no extra shuffle beyond
    * [[globalCumSum]]'s bucketed window.
    */
  def packSpans(df: DataFrame, orderCol: String, valueCol: String,
      budget: Long, shardCol: String = "shard",
      tokCol: String = "tok_in_shard", cumCol: String = "cum",
      buckets: Int = 64): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    globalCumSum(df, orderCol, valueCol, cumCol, buckets)
      .withColumn("__pk_v", coalesce(col(valueCol).cast("long"), lit(0L)))
      .filter(col("__pk_v") > 0)
      .withColumn("__pk_s", col(cumCol) - col("__pk_v"))
      .withColumn(shardCol, explode(sequence(
        expr(s"__pk_s div ${budget}L"),
        expr(s"(${cumCol} - 1L) div ${budget}L"))))
      .withColumn(tokCol,
        least(col(cumCol), (col(shardCol) + 1) * budget) -
          greatest(col("__pk_s"), col(shardCol) * budget))
      .drop("__pk_v", "__pk_s")
  }
}
