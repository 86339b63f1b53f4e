package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints evaluated as ONE aggregation pass
  * per table (plus one anti-join per referential constraint) — the
  * dbt-test / Deequ role: every load asserts its inputs before publishing.
  *
  * Each check returns a (check, violations) row; a suite unions them into
  * a small report DataFrame the caller can gate a pipeline on
  * (`report.filter($"violations" > 0).isEmpty`). Violation COUNTS rather
  * than violating ROWS keep the report driver-safe at any scale; chase
  * individual rows with the predicate the check names.
  *
  * Scale shape: `notNull`/`inRange`/`satisfies` checks on one table fuse
  * into a single conditional-count aggregate (one scan, map-side
  * partials); `unique` is one hash aggregate on the key; `referential`
  * is a LeftAnti join (broadcast when the parent side is small).
  */
object Checks {

  final case class Check(name: String, violations: Column)

  /** Rows where `c` is null. */
  def notNull(c: String): Check =
    Check(s"not_null($c)", count(when(col(c).isNull, 1)))

  /** Rows outside [lo, hi] (nulls are counted by [[notNull]], not here). */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c,$lo,$hi)",
      count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)))

  /** Rows failing an arbitrary row predicate (nulls fail). */
  def satisfies(name: String, pred: Column): Check =
    Check(s"satisfies($name)", count(when(!coalesce(pred, lit(false)), 1)))

  /** Evaluate row-level checks in one aggregation pass over `df`. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val first = checks.head
    val agg = df.agg(first.violations.as(first.name),
      checks.tail.map(c => c.violations.as(c.name)): _*)
    // one row of N counts → N rows of (check, violations); backticks keep
    // dots inside generated names (in_range(v,0.0,…)) from parsing as
    // struct field access
    agg.select(explode(map(
      checks.flatMap(c => Seq(lit(c.name), col(s"`${c.name}`"))): _*))
      .as(Seq("check", "violations")))
  }

  /** Keys appearing more than once: one hash aggregate. */
  def uniqueReport(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > 1)
      .agg(coalesce(sum(col("__n") - 1), lit(0L)).as("violations"))
      .select(lit(s"unique(${keys.mkString(",")})").as("check"),
        col("violations"))

  /** Child keys with no parent (FK violation): one LeftAnti join. */
  def referentialReport(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"referential($childKey->$parentKey)").as("check"),
        col("violations"))
}
