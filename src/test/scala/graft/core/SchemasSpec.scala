package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("catalog covers every reference mart with partition/order metadata") {
    assert(Schemas.all.map(_.name).toSet == Set(
      "subject", "applicant", "teacher", "guardian", "student", "school",
      "campus", "group_structure", "structure_record", "subject_score",
      "student_month_subject_score_staging", "student_transcript_staging"))
    // PARTITION BY schoolId multi-tenant layout (SURVEY §1.1)
    assert(Schemas.subject.partitionBy == Seq("schoolId"))
    assert(Schemas.subjectScore.partitionBy == Seq("schoolId", "subjectId"))
    // clustered ORDER BY keys
    assert(Schemas.studentMonthSubjectScore.orderBy ==
      Seq("monthEvaluationId", "subjectEvaluationId", "studentId"))
    assert(Schemas.transcript.orderBy ==
      Seq("groupStructureId", "structureRecordId", "studentId"))
  }

  test("transcript detail struct has the 18 DDL fields in order") {
    assert(Schemas.transcriptDetail.fieldNames.toSeq == Seq(
      "subjectEvaluationId", "subjectName", "subjectNameNative", "code",
      "credit", "score", "maxScore", "percentage", "grade", "meaning", "gpa",
      "subjectParentName", "subjectParentEvaluationId", "subjectParentType",
      "monthName", "monthEvaluationId", "semesterName", "semesterEvaluationId"))
  }

  test("conform applies DDL defaults, casts, and column order") {
    val raw = Seq(
      ("a1", "sub", "det", "prof", "2024-01-01 00:00:00", "sch", "e1"),
      ("a2", "sub", "det", "prof", "2024-01-02 00:00:00", "sch", "e2")
    ).toDF("applicantId", "enrollToSubject", "enrollToDetail", "lastProfile",
      "updatedAt", "schoolId", "enrollToId")
      .withColumn("createdAt", col("updatedAt"))
      .withColumn("status", when(col("applicantId") === "a1", "done"))
    val got = Schemas.applicant.conform(raw)
    assert(got.schema.fieldNames.toSeq == Schemas.applicant.schema.fieldNames.toSeq)
    assert(got.schema("updatedAt").dataType == TimestampType) // string→timestamp cast
    val rows = got.orderBy($"applicantId").collect()
    assert(rows(0).getAs[String]("status") == "done")
    assert(rows(1).getAs[String]("status") == "pending")       // DEFAULT
    assert(rows(0).getAs[Boolean]("toNotifyApplicant") == false) // absent col → default
    assert(rows(0).getAs[String]("admissionFlow") == "default")
  }

  test("pipeline outputs conform to their mart specs end-to-end") {
    // the month pipeline's output slots into its DDL schema
    val monthCols = Schemas.studentMonthSubjectScore.schema.fieldNames.toSet
    val tCols = Schemas.transcript.schema.fieldNames.toSet
    // every DDL column is produced by the pipeline (or defaulted)
    val monthProduced = Set("schoolId", "campusId", "structureRecordId",
      "structureRecordName", "groupStructureId", "structurePath", "studentId",
      "studentFirstName", "studentLastName", "studentFirstNameNative",
      "studentLastNameNative", "idCard", "dob", "gender", "monthEvaluationId",
      "monthName", "monthStartDate", "monthEndDate", "subjectEvaluationId",
      "subjectName", "subjectNameNative", "subjectMaxScore", "credit", "coe",
      "code", "score", "percentage", "grade", "gpa", "meaning", "scoreSource",
      "scorerId", "markedAt", "description", "customEvaluationCount",
      "customEvaluations", "createdAt")
    assert((monthCols -- monthProduced).isEmpty)
    assert(tCols.contains("subjectDetails") && tCols.contains("totalGPA"))
  }

  test("Sources.parquet asserts declared types and pushes projection") {
    val dir = java.nio.file.Files.createTempDirectory("src_spec").toString + "/t"
    Seq(("x", 1L, 2.5)).toDF("name", "n", "v").write.parquet(dir)
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("n", LongType)))
    val got = graft.sources.Sources.parquet(spark, dir, schema,
      projection = Seq("name", "n"), predicate = Some("n > 0"))
    assert(got.columns.toSeq == Seq("name", "n"))
    assert(got.count() == 1)
    // declared-type mismatch fails loudly
    val bad = StructType(Seq(StructField("n", StringType)))
    intercept[IllegalArgumentException] {
      graft.sources.Sources.parquet(spark, dir, bad, projection = Seq("n"))
    }
  }

  test("bootstrap applies each spec once and re-runs are no-ops (K5 ledger)") {
    val base = java.nio.file.Files.createTempDirectory("bootstrap_spec").toString
    val specs = Seq(Schemas.school, Schemas.guardian)
    val first = Schemas.bootstrap(spark, base, specs)
    assert(first == Seq("school", "guardian"))
    // materialized schema matches the declared one (parquet round-trips
    // relax nullability, so compare names + types)
    assert(spark.read.parquet(s"$base/school").schema
      .map(f => (f.name, f.dataType)) ==
      Schemas.school.schema.map(f => (f.name, f.dataType)))
    assert(spark.read.parquet(s"$base/school").count() == 0)
    // a pipeline appends data; bootstrap must NOT clobber it
    Schemas.school.conform(
        Seq(("s1", "One", "http://x")).toDF("schoolId", "name", "url"))
      .write.mode("append").parquet(s"$base/school")
    val second = Schemas.bootstrap(spark, base, specs)
    assert(second.isEmpty, s"re-run applied: $second")
    assert(spark.read.parquet(s"$base/school").count() == 1)
    // a NEW spec joining the catalog applies incrementally
    val third = Schemas.bootstrap(spark, base, specs :+ Schemas.teacher)
    assert(third == Seq("teacher"))
  }

  test("bootstrap repairs crash debris but adopts readable un-ledgered tables") {
    val base = java.nio.file.Files.createTempDirectory("bootstrap_repair").toString
    // debris: a dir with no parquet footer (crashed write), no ledger entry
    new java.io.File(s"$base/school/_temporary").mkdirs()
    // live table: readable parquet, but its ledger entry was lost
    Schemas.guardian.conform(Seq(("g1", "sch1", "Ana", "Lee"))
        .toDF("guardianId", "schoolId", "firstName", "lastName"))
      .write.parquet(s"$base/guardian")
    val applied = Schemas.bootstrap(spark, base,
      Seq(Schemas.school, Schemas.guardian))
    assert(applied == Seq("school", "guardian"))
    // debris was repaired into a readable empty table
    assert(spark.read.parquet(s"$base/school").count() == 0)
    // the live table was ADOPTED, not clobbered
    assert(spark.read.parquet(s"$base/guardian").count() == 1)
    // and both are now ledgered: re-run is a no-op
    assert(Schemas.bootstrap(spark, base,
      Seq(Schemas.school, Schemas.guardian)).isEmpty)
  }
}
