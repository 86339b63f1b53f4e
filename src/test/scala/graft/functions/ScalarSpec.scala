package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarSpec extends SparkSpec {
  import spark.implicits._

  private def grades(pcts: Double*) =
    pcts.toDF("pct")
      .select(Scalar.gradeInfo($"pct").as("g"))
      .select($"g.grade", $"g.gpa", $"g.meaning")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
      .toSeq

  test("gradeInfo hits every boundary edge exactly (F6)") {
    // each reference boundary, at the edge and just below it
    assert(grades(85.0) == Seq(("A", 4.0, "Excellent")))
    assert(grades(84.999) == Seq(("B+", 3.5, "Very Good")))
    assert(grades(80.0) == Seq(("B+", 3.5, "Very Good")))
    assert(grades(79.999) == Seq(("B", 3.0, "Good")))
    assert(grades(70.0) == Seq(("B", 3.0, "Good")))
    assert(grades(65.0) == Seq(("C+", 2.5, "Fairly Good")))
    assert(grades(50.0) == Seq(("C", 2.0, "Fair")))
    assert(grades(45.0) == Seq(("D", 1.5, "Poor")))
    assert(grades(40.0) == Seq(("E", 1.0, "Very Poor")))
    assert(grades(39.999) == Seq(("F", 0.0, "Failure")))
    assert(grades(0.0) == Seq(("F", 0.0, "Failure")))
    assert(grades(120.0) == Seq(("A", 4.0, "Excellent")))
  }

  test("gradeInfo gpa is monotone in percentage (SURVEY §5 property)") {
    val pcts = (0 to 200).map(_ / 2.0)
    val gpas = grades(pcts: _*).map(_._2)
    assert(gpas == gpas.sorted)
  }

  test("percentage guards maxScore: null→100 fallback, ≤0→0 (F7)") {
    val df = Seq(
      (50.0, Some(200.0)), // plain: 25%
      (50.0, None),        // fallback 100 → 50%
      (50.0, Some(0.0)),   // guard → 0
      (50.0, Some(-5.0))   // guard → 0
    ).toDF("score", "maxScore")
    val got = df.select(Scalar.percentage($"score", $"maxScore")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(25.0, 50.0, 0.0, 0.0))
  }

  test("normalizeGender maps case-insensitive m/f variants, passes others (F5)") {
    val df = Seq("Male", "M", "f", "FEMALE", "nonbinary", "male").toDF("g")
    val got = col0(df.select(Scalar.normalizeGender($"g")))
    assert(got == List("male", "male", "female", "female", "nonbinary", "male"))
  }

  test("parseTimestampLoose parses ISO8601 variants, legacy literal, nulls garbage (F1+F2)") {
    val df = Seq(
      "2024-03-05T10:20:30Z",
      "2024-03-05T10:20:30.123Z",
      "2024-03-05T10:20:30.123456Z",
      "2024-03-05 10:20:30",
      "datetime.date@version=2(1999-09-09)",
      "not a date",
      "2024-13-45T99:99:99Z" // shape matches, values invalid → null
    ).toDF("raw")
    val got = df.select(
      date_format(Scalar.parseTimestampLoose($"raw"), "yyyy-MM-dd HH:mm:ss"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq == Seq(
      Some("2024-03-05 10:20:30"),
      Some("2024-03-05 10:20:30"),
      Some("2024-03-05 10:20:30"),
      Some("2024-03-05 10:20:30"),
      Some("1999-09-09 00:00:00"),
      None,
      None))
  }

  test("parseTimestampLoose: shape grammar is exact; fractions keep precision") {
    // shapes OUTSIDE the accepted grammar must null (the fused classifier
    // must not be looser than the per-format guards it replaced)
    val rejected = Seq(
      "2024-03-05T10:20:30.12Z", // 2 fraction digits
      "2024-03-05T10:20:30.123456789Z", // 9 fraction digits
      "2024-03-05T10:20:30+02:00", // offset form
      "2024-03-05T10:20:30", // missing Z
      "2024-03-05" // date only
    ).toDF("raw")
    assert(rejected.select(Scalar.parseTimestampLoose($"raw"))
      .collect().forall(_.isNullAt(0)))
    // fractional seconds survive to the microsecond
    val micros = Seq("2024-03-05T10:20:30.123456Z").toDF("raw")
      .select(date_format(Scalar.parseTimestampLoose($"raw"),
        "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .head().getString(0)
    assert(micros == "2024-03-05 10:20:30.123456")
  }

  test("toDoubleOrNull casts silently (F4 to_float semantics)") {
    val df = Seq("95.5", "abc", "", "7", "-1.25e2").toDF("s")
    val got = df.select(Scalar.toDoubleOrNull($"s")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(Some(95.5), None, None, Some(7.0), Some(-125.0)))
  }

  test("structureRecordIdFromPath splits on # with missing-# guard (F8)") {
    val df = Seq("root#rec-123#leaf", "norecord", "head#tail").toDF("p")
    val got = df.select(Scalar.structureRecordIdFromPath($"p")).collect().map(r =>
      Option(r.getString(0)))
    assert(got.toSeq == Seq(Some("rec-123"), None, Some("tail")))
  }

  test("coalesceChain takes the first non-null (F14)") {
    val df = Seq(
      (Some("a"), Some("b"), "c"),
      (None: Option[String], Some("b"), "c"),
      (None: Option[String], None: Option[String], "c")
    ).toDF("c1", "c2", "c3")
    assert(col0(df.select(Scalar.coalesceChain($"c1", $"c2", $"c3"))) == List("a", "b", "c"))
  }
}
