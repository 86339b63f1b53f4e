package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions re-expressing the reference's per-row Python
  * transforms (SURVEY §2.7) as native Catalyst expressions — codegen'd, no
  * UDFs, so they stay inside WholeStageCodegen at any scale.
  */
object Scalar {

  /** F6 grade scale — get_grade_info
    * (dags/student_scores_subject/etl_student_scores_subject_month_to_clickhouse.py:84-109).
    * percentage → (grade, gpa, meaning); boundaries are ≥ comparisons in the
    * exact reference order. */
  def gradeInfo(pct: Column): Column = {
    def tier(g: String, gpa: Double, m: String) =
      struct(lit(g).as("grade"), lit(gpa).as("gpa"), lit(m).as("meaning"))
    when(pct >= 85, tier("A", 4.0, "Excellent"))
      .when(pct >= 80, tier("B+", 3.5, "Very Good"))
      .when(pct >= 70, tier("B", 3.0, "Good"))
      .when(pct >= 65, tier("C+", 2.5, "Fairly Good"))
      .when(pct >= 50, tier("C", 2.0, "Fair"))
      .when(pct >= 45, tier("D", 1.5, "Poor"))
      .when(pct >= 40, tier("E", 1.0, "Very Poor"))
      .otherwise(tier("F", 0.0, "Failure"))
  }

  /** F7 percentage with the reference's maxScore guard: `maxScore <= 0` (or
    * null) yields 0, missing maxScore falls back to 100
    * (dags/student_scores_subject/...py:208-211). */
  def percentage(score: Column, maxScore: Column): Column = {
    val mx = coalesce(maxScore, lit(100.0))
    when(mx > 0, score / mx * 100).otherwise(lit(0.0))
  }

  /** F5 gender normalization (dags/student/etl_students_to_clickhouse.py:75-80):
    * case-insensitive {male,m}→male, {female,f}→female, else passthrough. */
  def normalizeGender(g: Column): Column =
    when(lower(g).isin("male", "m"), "male")
      .when(lower(g).isin("female", "f"), "female")
      .otherwise(g)

  /** F1+F2 loose timestamp parsing — clean_timestamps / format_datetime
    * (dags/applicant/etl_applicants_to_clickhouse.py:21-38,
    * dags/student_scores_subject/...py:56-82): ISO8601 with or without
    * fractional seconds and Z, plus the legacy
    * `datetime.date@version=2(yyyy-mm-dd)` rescue; anything else → null
    * (the reference's silent-None semantics). */
  def parseTimestampLoose(c: Column): Column = {
    // ONE classifying rlike admits exactly the four accepted shapes
    // (ISO8601 T...Z with 0/3/6 fraction digits, or space-separated), then
    // ONE format-free try_to_timestamp parses them all — Spark's native
    // ISO cast handles optional fraction and Z, and the session is pinned
    // UTC so Z-suffixed values parse identically to the per-format
    // variants this replaced (4 rlike + per-shape parses; the fused guard
    // halves the per-row regex work, ScalarSpec pins the semantics).
    val shapes = "^\\d{4}-\\d{2}-\\d{2}" +
      "(T\\d{2}:\\d{2}:\\d{2}(\\.\\d{3}|\\.\\d{6})?Z| \\d{2}:\\d{2}:\\d{2})$"
    coalesce(
      when(c.rlike(shapes), try_to_timestamp(c)),
      try_to_timestamp(
        nullif(regexp_extract(c, "\\((\\d{4}-\\d{2}-\\d{2})\\)", 1), lit("")),
        lit("yyyy-MM-dd"))
    )
  }

  /** F4 silent-null numeric cast — to_float try/except
    * (dags/score/etl_scores_by_subject_to_clickhouse.py:39-47). */
  def toDoubleOrNull(c: Column): Column = c.try_cast("double")

  /** F1 clean_timestamps variant (dags/applicant/etl_applicants_to_clickhouse.py:21-38):
    * ISO8601 `...T...Z` strings become `yyyy-MM-dd HH:mm:ss`; anything that
    * fails to parse PASSES THROUGH unchanged (unlike [[parseTimestampLoose]],
    * which nulls) — the reference's per-row try/except `pass`. */
  def cleanTimestampPassthrough(c: Column): Column = {
    val parsed = coalesce(
      when(c.rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d+Z$"),
        try_to_timestamp(regexp_replace(c, "\\.\\d+Z$", "Z"),
          lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))),
      when(c.rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z$"),
        try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss'Z'"))))
    coalesce(date_format(parsed, "yyyy-MM-dd HH:mm:ss"), c)
  }

  /** F8 structurePath split — `path.split("#")[1]` with a missing-`#` guard
    * (dags/student_scores_subject/...py:364-368). */
  def structureRecordIdFromPath(path: Column): Column =
    when(size(split(path, "#")) > 1, split(path, "#").getItem(1))

  /** F14 coalesce chain (dags/student_scores_subject/...py:386). */
  def coalesceChain(cs: Column*): Column = coalesce(cs: _*)
}
