package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table catalog over the driver-generated parquet dirs (TESTDATA.md).
  *
  * Mirrors the reference's fixed, declared-up-front schema catalog (SURVEY
  * §1.1: every ClickHouse table is DDL-declared; nothing is inferred at query
  * time). Here the parquet footers carry the authoritative schema, so reads
  * are exact; production entry points that ingest schemaless sources go
  * through [[graft.sources.Sources]] with explicit `StructType`s instead.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). We read nanos as
    * a plain long and convert to a microsecond timestamp. The conversion uses
    * integral `div` (never double division: epoch-nanos exceed 2^53) and is
    * exact — the generator emits µs-precision values.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case _ => spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view — the reference's Metabase-facing
    * "everything is SELECT-able" surface (SURVEY §3.3) as plain `spark.sql`.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
