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
