package graft.sources

import graft.core.Schemas.TableSpec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Source readers (SURVEY §2.1) — every production read declares its schema
  * up front (the reference's fixed-DDL discipline, §1.1: no inference in
  * production paths) and hands projection + predicate to the reader so they
  * reach the scan:
  *
  *  - parquet: `PushedFilters` / `ReadSchema` prune row groups and columns;
  *  - JDBC (S2/S3/S5 — the reference's Postgres extracts and federated
  *    `ENGINE = PostgreSQL` databases): the predicate lands in the remote
  *    WHERE clause, the projection in the remote SELECT;
  *  - the S4 IN-list "semi-join pushdown" is `Relational.semiJoin` — never a
  *    driver-collected key list.
  */
object Sources {

  /** Schema-checked parquet read: declared schema is asserted against the
    * footer (names + types of the projected columns) so drift fails loudly
    * at plan time. */
  def parquet(spark: SparkSession, path: String, schema: StructType,
      projection: Seq[String] = Nil, predicate: Option[String] = None): DataFrame = {
    val raw = spark.read.parquet(path)
    val declared = schema.fields.map(f => f.name -> f.dataType).toMap
    val wanted = if (projection.nonEmpty) projection else schema.fieldNames.toSeq
    wanted.foreach { n =>
      val actual = raw.schema.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"$path: missing column $n"))
      declared.get(n).foreach { t =>
        require(actual.dataType == t,
          s"$path: $n is ${actual.dataType}, declared $t")
      }
    }
    val projected = raw.select(wanted.map(col): _*)
    predicate.map(projected.filter).getOrElse(projected)
  }

  /** JDBC read with pushdown — `dbtable` as a projected/filtered subquery so
    * the remote engine does the work (the reference embeds its watermark
    * predicate in source SQL the same way, S3). Partitioned reads via
    * `partitionColumn` bounds parallelize the extract across executors. */
  def jdbc(spark: SparkSession, url: String, table: String,
      projection: Seq[String] = Seq("*"), predicate: Option[String] = None,
      partitionColumn: Option[(String, Long, Long, Int)] = None,
      props: java.util.Properties = new java.util.Properties()): DataFrame = {
    val where = predicate.map(p => s" WHERE $p").getOrElse("")
    val sub = s"(SELECT ${projection.mkString(", ")} FROM $table$where) AS src"
    val reader = spark.read
    partitionColumn match {
      case Some((c, lo, hi, n)) =>
        reader.jdbc(url, sub, c, lo, hi, n, props)
      case None => reader.jdbc(url, sub, props)
    }
  }

  /** Read a mart table written by [[Sinks.writePartitioned]] and conform it
    * to its catalog spec — the read side of the schema contract. */
  def mart(spark: SparkSession, basePath: String, spec: TableSpec): DataFrame =
    spec.conform(spark.read.parquet(s"$basePath/${spec.name}"))
}
