package graft.pipelines

import graft.functions.Scalar
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** student_transcript_etl — the nested-output pipeline
  * (dags/student_transcript/etl_student_transcript_to_clickhouse.py:177-457):
  * per-(student, structureRecord) transcript records carrying an
  * Array(Struct) of 18-field subject details plus credit-weighted totals,
  * matching `student_transcript_staging`
  * (migrations/2025_02_25_15_30_create_transcript_table.sql:2-64).
  *
  * Faithfully preserved semantics — note where they DIFFER from the month
  * pipeline (SURVEY §1.2 risk register):
  *  - averaging filters null raw scores then coerces unparseable→0
  *    (:287-288) — the third null-handling variant;
  *  - custom→subject rollup is an UNWEIGHTED mean of custom percentages
  *    (:258) — no coe weighting;
  *  - direct scores beat custom-derived scores per (subject, student)
  *    (:280-295);
  *  - subject lookup is FIRST-match per structureRecordId (:325-328), vs
  *    the month pipeline's last-wins dict;
  *  - the 2-level parent walk is type-dispatched: subject→month→semester
  *    or subject→semester directly (:343-366), names default to "".
  *
  * Determinism contract where the reference depends on iteration order:
  * score attribution = least (markedAt, scorerId); the custom-path marker =
  * greatest markedAt; per-student scorer/markedAt = the greatest
  * subjectEvaluationId's; subjectDetails sorts by subjectEvaluationId.
  *
  * Scale shape: one exchange for the score reduction, one for the final
  * (student, structureRecord) assembly; dimension joins broadcast; the
  * nested array builds via collect_list inside the group — never on the
  * driver.
  */
object Transcripts {

  def apply(evaluations: DataFrame, scores: DataFrame, students: DataFrame,
      structureRecords: DataFrame, subjects: DataFrame): DataFrame = {

    val subjEvals = evaluations.filter(col("type") === "subject")
    val customEvals = evaluations.filter(col("type") === "custom")

    // ---- per-(evaluation, student) reduction ------------------------------
    // filter null raw, parse, coerce unparseable→0 (:287-288)
    val attrs = struct(col("structurePath"), col("scorerId"), col("markedAt"))
    val perEvalStudent = scores
      .groupBy(col("evaluationId"), col("studentId"))
      .agg(
        avg(when(col("score").isNotNull,
          coalesce(Scalar.toDoubleOrNull(col("score")), lit(0.0)))).as("avg0"),
        count(col("score")).as("n_nonnull"),
        min_by(attrs, struct(coalesce(col("markedAt"), lit("")),
          coalesce(col("scorerId"), lit("")))).as("attrs"))
      .filter(col("n_nonnull") > 0)

    // ---- custom→subject unweighted percentage mean (:226-268) -------------
    val customPct = perEvalStudent
      .join(customEvals.select(col("evaluationId"),
          col("parentId").as("subjectEvaluationId"),
          Scalar.toDoubleOrNull(col("maxScore")).as("customMaxRaw")),
        Seq("evaluationId"))
      .join(subjEvals.select(col("evaluationId").as("subjectEvaluationId")),
        Seq("subjectEvaluationId")) // :209 parent must be a subject eval
      .withColumn("pct",
        Scalar.percentage(col("avg0"), coalesce(col("customMaxRaw"), lit(100.0))))
    val customBySubject = customPct
      .groupBy(col("subjectEvaluationId"), col("studentId"))
      .agg(avg(col("pct")).as("avg_custom_pct"), // :258 unweighted
        max_by(col("attrs"),
          struct(coalesce(col("attrs.markedAt"), lit("")), col("evaluationId")))
          .as("custom_attrs")) // :297-301 latest marker

    // ---- direct-beats-custom resolution (:280-305) ------------------------
    val subjDim = subjEvals.select(
      col("evaluationId").as("subjectEvaluationId"),
      col("parentId").as("subjectParentId"), col("name").as("subjectName"),
      Scalar.toDoubleOrNull(col("maxScore")).as("subjectMaxRaw"),
      col("schoolId"))

    val direct = perEvalStudent
      .join(subjDim.select(col("subjectEvaluationId")),
        perEvalStudent("evaluationId") === col("subjectEvaluationId"))
      .select(col("subjectEvaluationId"), col("studentId"),
        col("avg0").as("final_score"), col("attrs"))

    val aggregated = customBySubject
      .join(direct.select(col("subjectEvaluationId"), col("studentId")),
        Seq("subjectEvaluationId", "studentId"), "left_anti")
      .join(subjDim.select(col("subjectEvaluationId"), col("subjectMaxRaw")),
        Seq("subjectEvaluationId"))
      // :265 percentage→score conversion has NO >0 guard (missing max → 100)
      .select(col("subjectEvaluationId"), col("studentId"),
        (col("avg_custom_pct") * coalesce(col("subjectMaxRaw"), lit(100.0)) / 100)
          .as("final_score"),
        col("custom_attrs").as("attrs"))

    val scored = direct.unionByName(aggregated)
      .join(subjDim, Seq("subjectEvaluationId"))
      .withColumn("subjectMax", coalesce(col("subjectMaxRaw"), lit(100.0)))
      .withColumn("percentage",
        Scalar.percentage(col("final_score"), col("subjectMax")))
      .withColumn("g", Scalar.gradeInfo(col("percentage")))
      .withColumn("structureRecordId",
        Scalar.structureRecordIdFromPath(col("attrs.structurePath")))

    // ---- type-dispatched 2-level parent walk (:343-366) -------------------
    val parentDim = evaluations.select(col("evaluationId").as("pid"),
      col("name").as("pname"), col("type").as("ptype"),
      col("parentId").as("ppid"))
    val grandDim = evaluations.select(col("evaluationId").as("gid"),
      col("name").as("gname"), col("type").as("gtype"))

    val withParents = scored
      .join(broadcast(parentDim),
        col("subjectParentId") === col("pid") && col("subjectParentId") =!= "na",
        "left")
      .join(broadcast(grandDim),
        col("ppid") === col("gid") && col("ppid") =!= "na" &&
          col("ptype") === "month", "left")
      .withColumn("subjectParentName", coalesce(col("pname"), lit("")))
      .withColumn("subjectParentType", coalesce(col("ptype"), lit("")))
      .withColumn("monthName",
        when(col("ptype") === "month", col("pname")).otherwise(lit("")))
      .withColumn("monthEvaluationId",
        when(col("ptype") === "month", col("pid")))
      .withColumn("semesterName", coalesce(
        when(col("ptype") === "month" && col("gtype") === "semester", col("gname")),
        when(col("ptype") === "semester", col("pname")),
        lit("")))
      .withColumn("semesterEvaluationId", coalesce(
        when(col("ptype") === "month" && col("gtype") === "semester", col("gid")),
        when(col("ptype") === "semester", col("pid"))))

    // ---- first-match subject info per structureRecordId (:325-328) --------
    val subjectDim = graft.operators.Relational.dedupLatest(
      subjects, Seq("structureRecordId"), Seq(col("subjectId").asc))
      .select(col("structureRecordId").as("srId"),
        col("nameNative").as("subjectNameNative"),
        col("code"), col("credit"))

    val details = withParents
      .join(broadcast(subjectDim), col("structureRecordId") === col("srId"), "left")
      .withColumn("credit2",
        coalesce(col("credit").cast("double"), lit(0.0))) // :374 default 0
      .withColumn("detail", struct(
        col("subjectEvaluationId"),
        coalesce(col("subjectName"), lit("")).as("subjectName"),
        coalesce(col("subjectNameNative"), lit("")).as("subjectNameNative"),
        coalesce(col("code"), lit("")).as("code"),
        col("credit2").as("credit"),
        col("final_score").as("score"),
        col("subjectMaxRaw").as("maxScore"),
        col("percentage"),
        col("g.grade").as("grade"),
        col("g.meaning").as("meaning"),
        col("g.gpa").as("gpa"),
        col("subjectParentName"),
        col("pid").as("subjectParentEvaluationId"),
        col("subjectParentType"),
        col("monthName"), col("monthEvaluationId"),
        col("semesterName"), col("semesterEvaluationId")))

    // ---- per-student scorer attribution (:331-332, last-write-wins) -------
    val scorerByStudent = details
      .groupBy(col("studentId"))
      .agg(
        max_by(col("attrs.scorerId"), col("subjectEvaluationId")).as("scorerId"),
        date_format(Scalar.parseTimestampLoose(
          max_by(col("attrs.markedAt"), col("subjectEvaluationId"))),
          "yyyy-MM-dd HH:mm:ss").as("markedAt"))

    // ---- transcript assembly (:399-452) -----------------------------------
    val studentDim = students.select(col("studentId"),
      col("firstName").as("studentFirstName"),
      col("lastName").as("studentLastName"),
      col("firstNameNative").as("studentFirstNameNative"),
      col("lastNameNative").as("studentLastNameNative"),
      col("idCard"), col("gender"), col("dob"), col("campusId"))
    val structDim = structureRecords.select(
      col("structureRecordId").as("srId2"),
      col("name").as("structureRecordName"),
      col("groupStructureId"))

    details
      .groupBy(col("studentId"), col("structureRecordId"))
      .agg(
        sort_array(collect_list(col("detail"))).as("subjectDetails"),
        min_by(col("schoolId"), col("subjectEvaluationId")).as("schoolId"), // :417
        sum(col("credit2")).as("totalCredits"),
        (sum(col("credit2") * col("g.gpa")) / sum(col("credit2"))).as("gpaRatio"),
        count(lit(1)).as("subjectCount"))
      .withColumn("totalGPA",
        when(col("totalCredits") > 0, col("gpaRatio")).otherwise(lit(0.0)))
      .drop("gpaRatio")
      .join(broadcast(studentDim), Seq("studentId"), "left")
      .join(broadcast(structDim),
        col("structureRecordId") === col("srId2"), "left").drop("srId2")
      .join(broadcast(scorerByStudent), Seq("studentId"), "left")
      .select(
        col("schoolId"), col("campusId"),
        col("structureRecordId"), col("structureRecordName"),
        col("groupStructureId"),
        concat(lit("#"), col("structureRecordId")).as("structurePath"), // :424
        col("studentId"), col("studentFirstName"), col("studentLastName"),
        col("studentFirstNameNative"), col("studentLastNameNative"),
        col("idCard"), col("gender"), col("dob"),
        col("subjectDetails"),
        col("totalCredits"), col("totalGPA"), col("subjectCount"),
        col("scorerId"), col("markedAt"),
        date_format(current_timestamp(), "yyyy-MM-dd HH:mm:ss").as("createdAt"))
  }
}
