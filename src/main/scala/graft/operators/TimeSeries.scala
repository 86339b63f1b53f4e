package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-calendar time-series repair over sparse per-key observations —
  * the feature-store / reporting primitive the reference's warehouse
  * consumers build downstream of every ETL DAG (daily rollups with no row
  * on quiet days read as "missing", not "zero"; ref
  * apps/airflow/dags/score/etl_scores_by_subject_to_clickhouse.py builds
  * exactly such month-keyed series).
  *
  * [[gapFillLocf]] materializes the dense (key × calendar-day) spine and
  * carries the last observation forward within each key (LOCF). Scale
  * shape: the spine is keys × days — calendar-bounded metadata, built from
  * a 1-row global bounds aggregate cross-joined (broadcast) with the
  * distinct-key dimension — while the only data-sized stages are the
  * observation aggregation itself and ONE window pass per key ordered by
  * day. Nothing here is quadratic and the window partitions by key, so a
  * 1000-executor run distributes by key with no skew beyond the calendar
  * length.
  */
object TimeSeries {

  /** @param obs     sparse observations (keyCol, dayCol: date, valCol)
    *                — at most one row per (key, day); aggregate upstream
    * @param spine   dense (keyCol, dayCol) calendar to fill onto
    * @param keyCol  series identity column
    * @param dayCol  date column (any orderable granularity works)
    * @param valCol  value to carry forward
    * @return spine columns + `<valCol>_filled` (LOCF, null before the
    *         first observation) + `observed` (1 where a real row existed) */
  def gapFillLocf(obs: DataFrame, spine: DataFrame, keyCol: String,
      dayCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(obs, Seq(keyCol, dayCol), "left")
      .select(col(keyCol), col(dayCol),
        last(col(valCol), ignoreNulls = true).over(w).as(s"${valCol}_filled"),
        when(col(valCol).isNull, 0).otherwise(1).as("observed"))
  }

  /** Dense (key × day) calendar spine: every key from `keys` crossed with
    * every day in the CLOSED interval [lo, hi] taken from `bounds` (a
    * 1-row frame, broadcast by size). */
  def dailySpine(keys: DataFrame, bounds: DataFrame, keyCol: String,
      loCol: String, hiCol: String, dayCol: String): DataFrame =
    keys.crossJoin(broadcast(bounds))
      .select(col(keyCol),
        explode(sequence(col(loCol), col(hiCol))).as(dayCol))

  /** Per-key union of CLOSED intervals [start, end] — the sweep-line
    * gaps-and-islands move: within each key, ordered by (start, end), a
    * new island begins exactly where `start` exceeds the running max `end`
    * of every earlier interval; islands then collapse to (min start,
    * max end). Coverage ("how many days was this customer active",
    * "what wall-clock did these sessions span") reads off the merged rows.
    *
    * Scale shape: ONE window pass partitioned by key (running max + running
    * island counter share the same sort) and one aggregate on (key,
    * island) — no self-join, no interval×interval blowup, distributes by
    * key. Deterministic under duplicate (start, end) rows: tied intervals
    * can never start an island relative to each other (end ≥ start), so
    * island labels are a pure function of the interval multiset.
    *
    * @param df       intervals (keyCol, startCol, endCol), end ≥ start,
    *                 any orderable type
    * @return (keyCol, startCol, endCol) — disjoint merged intervals */
  def intervalUnion(df: DataFrame, keyCol: String, startCol: String,
      endCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    // first row of a key: prevMax is null → condition null → 0 (same island)
    val island = sum(when(col(startCol) > prevMax, 1).otherwise(0))
      .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__island", island)
      .groupBy(col(keyCol), col("__island"))
      .agg(min(col(startCol)).as(startCol), max(col(endCol)).as(endCol))
      .drop("__island")
  }
}
