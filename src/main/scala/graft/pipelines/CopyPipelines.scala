package graft.pipelines

import graft.functions.Scalar
import graft.operators.Relational
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The seven "thin" reference pipelines — extract → per-row fixups → load —
  * re-expressed as pure DataFrame transforms (SURVEY §0 DAG table; lifecycle
  * §3.2). Each function is the DAG's transform step; extraction filters
  * (watermark, DISTINCT ON) are applied here so they push into the source
  * scan, and the write side is [[graft.sources.Sinks.writePartitioned]]
  * wired by [[Runner]].
  *
  * All transforms are schema-preserving except where the reference rewrites
  * a column; they never collect, never depend on row order, and keep every
  * expression codegen-friendly — the per-row Python loops of the reference
  * become vectorized Column programs.
  */
object CopyPipelines {

  /** students_to_clickhouse (dags/student/etl_students_to_clickhouse.py:28-116):
    * watermark scan → DISTINCT ON uniqueKey latest → gender normalization
    * (F5) → profile JSON with the redundant nested `profile` key scrubbed
    * (F11). `profile` arrives as a struct; the scrub drops its inner
    * `profile` field if present, then serializes to the JSON-as-String
    * column the mart stores. */
  def students(raw: DataFrame, watermark: java.sql.Timestamp): DataFrame = {
    val fresh = Relational.incrementalFrom(raw, "updatedAt", watermark)
    val latest = Relational.dedupLatest(fresh, Seq("uniqueKey"),
      Seq(col("updatedAt").desc, col("studentId").desc))
    val profileCols = latest.schema.find(_.name == "profile") match {
      case Some(f) =>
        val inner = f.dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
        val kept = inner.fieldNames.filter(_ != "profile")
        to_json(struct(kept.map(n => col(s"profile.$n").as(n)).toSeq: _*))
      case None => lit(null).cast("string")
    }
    latest
      .withColumn("gender", Scalar.normalizeGender(col("gender")))
      .withColumn("profile", profileCols)
  }

  /** guardians_to_clickhouse (dags/guardian/etl_guardian_to_clickhouse.py:35-42):
    * full reload (the watermark was abandoned, comment :34) with DISTINCT ON
    * guardianId latest-version dedup. */
  def guardians(raw: DataFrame): DataFrame =
    Relational.dedupLatest(raw, Seq("guardianId"), Seq(col("updatedAt").desc))

  /** teachers_to_clickhouse (dags/teacher/etl_teachers_to_clickhouse.py:38-47):
    * watermark + DISTINCT ON teacherId. The reference's `toUUID('…')` literal
    * casts (F9) are obsolete under typed columns. */
  def teachers(raw: DataFrame, watermark: java.sql.Timestamp): DataFrame =
    Relational.dedupLatest(
      Relational.incrementalFrom(raw, "updatedAt", watermark),
      Seq("teacherId"), Seq(col("updatedAt").desc))

  /** schools_to_clickhouse (dags/school/etl_school_to_clickhouse.py:52-58):
    * watermark scan; list/struct columns serialize to JSON strings (F10,
    * :37-39). */
  def schools(raw: DataFrame, watermark: java.sql.Timestamp): DataFrame = {
    val fresh = Relational.incrementalFrom(raw, "updatedAt", watermark)
    fresh.schema.fields.foldLeft(fresh) { (df, f) =>
      f.dataType match {
        case _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType =>
          df.withColumn(f.name, to_json(col(f.name)))
        case _ => df
      }
    }
  }

  /** subjects_to_clickhouse (dags/subject/etl_subjects_to_clickhouse.py:182-193):
    * deliberate full reload, storage-ordered by updatedAt desc. */
  def subjects(raw: DataFrame): DataFrame =
    raw.orderBy(col("updatedAt").desc)

  /** applicants_to_clickhouse (dags/applicant/etl_applicants_to_clickhouse.py:48-144):
    * Mongo scan → clean_timestamps passthrough parsing on the ISO-string
    * columns (:21-38) → dict columns to JSON (:108-110) → DDL defaults
    * (status 'pending', toNotifyApplicant false —
    * migrations/..create_applicant_table.sql:5-16). */
  def applicants(raw: DataFrame): DataFrame = {
    val tsFixed = raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case org.apache.spark.sql.types.StringType =>
          df.withColumn(f.name, Scalar.cleanTimestampPassthrough(col(f.name)))
        case _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.MapType =>
          df.withColumn(f.name, to_json(col(f.name)))
        case _ => df
      }
    }
    tsFixed
      .withColumn("applicantStatus", coalesce(col("applicantStatus"), lit("pending")))
      .withColumn("toNotifyApplicant", coalesce(col("toNotifyApplicant"), lit(false)))
  }

  /** school_structures_to_clickhouse (dags/school_structure/...py:50-246):
    * four parallel watermarked copies — school, campus, group_structure,
    * structure_record — one watermark per table. */
  def schoolStructures(
      school: DataFrame, campus: DataFrame,
      groupStructure: DataFrame, structureRecord: DataFrame,
      watermark: java.sql.Timestamp): Map[String, DataFrame] = Map(
    "school" -> Relational.incrementalFrom(school, "updatedAt", watermark),
    "campus" -> Relational.incrementalFrom(campus, "updatedAt", watermark),
    "group_structure" -> Relational.incrementalFrom(groupStructure, "updatedAt", watermark),
    "structure_record" -> Relational.incrementalFrom(structureRecord, "updatedAt", watermark)
  )
}
