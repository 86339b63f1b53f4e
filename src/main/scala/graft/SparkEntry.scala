package graft

import graft.core.{Sessions, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multiway star join + deterministic revenue rollup (SURVEY §2.4/§2.5). */
  def entry(spark: SparkSession): DataFrame = {
    Sessions.tune(spark)
    Queries.queries("q08_join_multiway")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.queries.map { case (n, f) =>
      n -> ((s: SparkSession, dir: String) => f(Sessions.tune(s), dir))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
