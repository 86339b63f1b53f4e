package graft.plans

import graft.SparkSpec
import graft.functions.Text
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  /** Scope a body to a rule-free optimizer so kernel-vs-naive equivalence
    * tests genuinely exercise the naive form (the shared session may have
    * FuseJaccard installed by Sessions.tune, which would rewrite the
    * reference side into the kernel and vacate the comparison). */
  private def withoutGraftRules[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = Nil
    try body finally spark.experimental.extraOptimizations = prev
  }

  test("JaccardSimilarity matches the array-function jaccard on executed plans") {
    withoutGraftRules {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)),
      (Seq(1L, 2L), Seq(1L, 2L)),
      (Seq(1L), Seq(2L)),
      (Seq(1L, 1L, 2L), Seq(2L, 2L, 3L)) // duplicates collapse (set semantics)
    ).toDF("a", "b")
    val got = df.select(
      Bridge.toCol(JaccardSimilarity(Bridge.toExpr($"a"), Bridge.toExpr($"b"))).as("fused"),
      Text.jaccard($"a", $"b").as("arrays"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    }
  }

  test("JaccardSimilarity stays inside codegen (no fallback)") {
    // repartition defeats local-relation constant folding so the projection
    // actually executes in a codegen stage
    val df = Seq((Seq(1L, 2L), Seq(2L, 3L))).toDF("a", "b")
      .repartition(2)
      .select(Bridge.toCol(
        JaccardSimilarity(Bridge.toExpr($"a"), Bridge.toExpr($"b"))).as("j"))
    df.collect() // force final AQE plan
    val p = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\)""".r.findFirstIn(p).isDefined, s"fell out of codegen:\n$p")
  }

  test("misuse fails at analysis: wrong arity and wrong input types") {
    GraftFunctions.register(spark)
    val wrongArity = intercept[Exception] {
      spark.sql("SELECT graft_jaccard(array(1L))").collect()
    }
    assert(wrongArity.getMessage.contains("graft_jaccard"),
      s"arity error must name the function: ${wrongArity.getMessage}")
    val wrongType = intercept[Exception] {
      spark.sql("SELECT graft_jaccard('a', 'b')").collect()
    }
    assert(wrongType.getMessage.toLowerCase.contains("array")
      || wrongType.getMessage.contains("DATATYPE_MISMATCH"),
      s"type error must surface at analysis: ${wrongType.getMessage}")
  }

  test("FuseJaccard rewrites the naive SQL form into the fused kernel, semantics intact") {
    val prevRules = spark.experimental.extraOptimizations
    try {
    graft.core.Sessions.tune(spark)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    val df = Seq(
      (Option(Seq(1L, 2L, 3L)), Option(Seq(2L, 3L, 4L))),
      (Option(Seq.empty[Long]), Option(Seq.empty[Long])),
      (Option.empty[Seq[Long]], Option(Seq(1L)))).toDF("a", "b").repartition(2)
    val j = df.selectExpr(
      "size(array_intersect(a, b)) / size(array_union(a, b)) AS jac")
    assert(planOf(j).contains("graft_jaccard"), s"rule did not fire:\n${planOf(j)}")
    val rows = j.collect()
    assert(rows.exists(r => !r.isNullAt(0) && r.getDouble(0) == 0.5))
    assert(rows.exists(_.isNullAt(0)), "both-empty must stay 0/0 = null")
    // legacy sizeOfNull (the engine default): size(null) = -1, so the
    // naive form gives (-1)/(-1) = 1.0 on a null input - preserved
    assert(rows.exists(r => !r.isNullAt(0) && r.getDouble(0) == 1.0),
      "null input must keep the legacy (-1)/(-1) = 1.0 value")
    // must NOT fire: different array pairs
    val mixed = Seq((Seq(1L), Seq(1L), Seq(9L))).toDF("a", "b", "c")
      .repartition(2) // defeat local-relation constant folding
      .selectExpr("size(array_intersect(a, b)) / size(array_union(a, c)) AS x")
    assert(!planOf(mixed).contains("graft_jaccard"))
    // must NOT fire: non-bigint element type (not the kernel's input type)
    val strs = Seq((Seq("x"), Seq("x"))).toDF("a", "b")
      .repartition(2)
      .selectExpr("size(array_intersect(a, b)) / size(array_union(a, b)) AS x")
    assert(!planOf(strs).contains("graft_jaccard"))
    // symmetric pair order fires too
    val sym = Seq((Seq(1L, 2L), Seq(2L))).toDF("a", "b")
      .repartition(2)
      .selectExpr("size(array_intersect(a, b)) / size(array_union(b, a)) AS x")
    assert(planOf(sym).contains("graft_jaccard"))
    // must NOT fire: nullable-element arrays (kernel reads elements
    // primitively; a null element would silently read as 0)
    val nullable = Seq((Seq(Option(1L), Option.empty[Long]), Seq(Option(1L))))
      .toDF("a", "b")
      .repartition(2)
      .selectExpr("size(array_intersect(a, b)) / size(array_union(a, b)) AS x")
    assert(!planOf(nullable).contains("graft_jaccard"))
    } finally spark.experimental.extraOptimizations = prevRules
  }

  test("registered SQL functions work end-to-end") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
             graft_grade(87.0).grade AS g,
             graft_grade(42.0).gpa AS gpa,
             graft_percentage(50.0, 200.0) AS p,
             graft_percentage(50.0, 0.0) AS p0
    """).collect().head
    assert(r.getDouble(0) == 0.5)
    assert(r.getString(1) == "A")
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 25.0)
    assert(r.getDouble(4) == 0.0)
  }
}
