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

  /** Some generations of `events.parquet` store `ts` as INT64
    * TIMESTAMP(NANOS), which Spark's parquet reader rejects outright
    * (PARQUET_TYPE_ILLEGAL); newer generations store a standard
    * timestamp[us]. Dispatch on the schema the footer actually declares:
    * a long `ts` gets the nanos→µs rescue (integral `div`, never double
    * division — epoch-nanos exceed 2^53; exact because the generator emits
    * µs-precision values), a timestamp `ts` passes through untouched.
    */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = name match {
    case "events" =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/events.parquet")
      rescueNanosTs(df)
    case _ => spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize `ts` to a session-tz TIMESTAMP whatever the footer declares:
    *  - INT64 nanos (read as long under nanosAsLong) → the nanos→µs rescue;
    *  - TIMESTAMP_NTZ (parquet isAdjustedToUTC=false) → cast to TIMESTAMP.
    *    Value-preserving because the session time zone is pinned to UTC
    *    ([[Sessions]]): the NTZ wall-clock micros ARE the UTC micros. The
    *    cast matters downstream — watermarks (`withWatermark`) and
    *    `unix_micros` reject TIMESTAMP_NTZ outright;
    *  - TIMESTAMP → pass through.
    * Keeps the catalog working across all testdata generations.
    */
  def rescueNanosTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Register every table as a temp view — the reference's Metabase-facing
    * "everything is SELECT-able" surface (SURVEY §3.3) as plain `spark.sql`.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
