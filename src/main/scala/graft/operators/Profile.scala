package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level data profiling — the dbt-profile/Deequ-summary role
  * (complementing [[Checks]], which gates on declared constraints; this
  * DESCRIBES what's in the data so a human can write those constraints).
  */
object Profile {

  /** Top-k most frequent values per column, all columns in ONE scan.
    *
    * Every profiled column is stacked to (column, value-as-string) rows by
    * a single generator over the row — one pass over the table no matter
    * how many columns are profiled — then one hash aggregate counts
    * (column, value) pairs and a per-column window takes the k heaviest.
    * Ties break deterministically (count desc, value asc), so the result
    * is a pure function of the data.
    *
    * Scale shape: the stacked stream is |rows|·|cols| but map-side
    * combines into at most Σ per-column cardinality groups before the
    * exchange; the window partitions by column name over those group
    * counts, never over raw rows. Profiling a 100 TB table shuffles
    * O(distinct values), not O(rows).
    *
    * @param df   input table
    * @param cols columns to profile (any type; values rendered as strings,
    *             nulls kept as a countable group)
    * @param k    values to keep per column
    * @return (col_name, value, n, rk) with rk in 1..k */
  def topValues(df: DataFrame, cols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"topValues needs k >= 1, got $k")
    val counts = stack(df, cols).groupBy("col_name", "value")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("col_name")
      .orderBy(col("n").desc, col("value").asc_nulls_first)
    counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Per-column summary in ONE scan: row count, null count, exact distinct
    * count, and min/max of the RENDERED (string) values — lexicographic by
    * design, since one profile row must describe any column type. Spark
    * plans the multi-distinct aggregate with an Expand over the stacked
    * stream: still a single pass over the table, shuffle bounded by
    * distinct values per column.
    *
    * @return (col_name, n_rows, n_null, n_distinct, min_value, max_value) */
  def summary(df: DataFrame, cols: Seq[String]): DataFrame =
    stack(df, cols).groupBy("col_name")
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("value"))).as("n_null"),
        countDistinct(col("value")).as("n_distinct"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Key-skew profile — the shuffle-planning diagnostic: how concentrated
    * is a prospective join/groupBy key? Emits the exact ingredients a
    * planner (or a human choosing between broadcast / salting / AQE skew
    * handling) needs, all integer-exact:
    *
    *   - n_total rows, n_keys distinct keys, max_count of the hottest key,
    *     and that key (ties break to the smallest key value, rendered as
    *     a string so any key type profiles identically)
    *   - top1_num / top1_den   = max_count / n_total (hottest-key share)
    *   - hhi_num / hhi_den     = Σ c_i² / n_total²  (Herfindahl–Hirschman
    *     concentration: 1/n_keys for uniform keys → 1 for one key)
    *
    * Both rationals are DECIMAL(38,0) pairs (Σc² overflows int64 past
    * ~3·10⁹ rows on one key — real at corpus scale); render as strings per
    * SURVEY §2.13 before shipping to a gate. Scale shape: one hash
    * aggregate to the per-key count table, one map-side-combined aggregate
    * over it, and a TakeOrdered top-1 — shuffle is O(keys), never O(rows).
    *
    * @return one row: (n_total, n_keys, max_count, top_key,
    *         top1_num, top1_den, hhi_num, hhi_den) */
  def skewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
      .localCheckpoint() // read 2×: the moment aggregate and the top-1
    val moments = counts.agg(
      sum(col("c")).cast(d38).as("n_total"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_count"),
      sum((col("c").cast(d38) * col("c")).cast(d38)).cast(d38).as("sc2"))
    val top = counts.orderBy(col("c").desc, col(keyCol).asc).limit(1)
      .select(col(keyCol).cast("string").as("top_key"))
    moments.crossJoin(top)
      .select(
        col("n_total").cast("long").as("n_total"),
        col("n_keys"), col("max_count"), col("top_key"),
        col("max_count").cast(d38).as("top1_num"),
        col("n_total").as("top1_den"),
        col("sc2").as("hhi_num"),
        (col("n_total") * col("n_total")).cast(d38).as("hhi_den"))
  }

  /** (col_name, value-as-string) stream: every profiled column emitted by
    * one generator per row — one table scan for any number of columns. */
  private def stack(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profiling needs at least one column")
    df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*))
        .as("e"))
      .select(col("e.col_name").as("col_name"), col("e.value").as("value"))
  }
}
