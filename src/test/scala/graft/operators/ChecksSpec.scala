package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1), 10.0, "ok"),
    (Some(2), -5.0, "ok"),
    (None, 3.0, "bad"),
    (Some(4), 200.0, "ok")
  ).toDF("id", "v", "status")

  test("row checks fuse into one pass and count the right violations") {
    val rep = Checks.report(df, Seq(
      Checks.notNull("id"),
      Checks.inRange("v", 0.0, 100.0),
      Checks.satisfies("ok_status", $"status" === "ok")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("not_null(id)") == 1)
    assert(rep("in_range(v,0.0,100.0)") == 2) // -5 and 200
    assert(rep("satisfies(ok_status)") == 1)
  }

  test("row checks are ONE aggregation over ONE scan (plan shape)") {
    val plan = Checks.report(df, Seq(
      Checks.notNull("id"), Checks.inRange("v", 0.0, 100.0)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "check suite must not join")
    // a single aggregate pair (partial+final), not one per check
    assert("HashAggregate|SortAggregate|ObjectHashAggregate".r
      .findAllIn(plan).size <= 2, s"more than one aggregate pass:\n$plan")
  }

  test("null predicate results count as violations (satisfies)") {
    val d = Seq((Some(5), "x"), (None, "y")).toDF("n", "s")
    val rep = Checks.report(d, Seq(Checks.satisfies("n_pos", $"n" > 0)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("satisfies(n_pos)") == 1) // null > 0 is null -> violation
  }

  test("uniqueReport counts surplus rows, zero on unique keys") {
    val dup = Seq(1, 2, 2, 2, 3, 3).toDF("k")
    assert(Checks.uniqueReport(dup, Seq("k")).head().getLong(1) == 3)
    val uniq = Seq(1, 2, 3).toDF("k")
    assert(Checks.uniqueReport(uniq, Seq("k")).head().getLong(1) == 0)
  }

  test("referentialReport counts orphans") {
    val child = Seq(1, 2, 9, 9).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    assert(Checks.referentialReport(child, "fk", parent, "pk")
      .head().getLong(1) == 2)
  }
}

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("merged partial states equal the one-shot aggregate") {
    val all = Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", 7L), ("c", 4L))
      .toDF("k", "v")
    val full = all.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
      .orderBy("k").collect().toSeq
    def partial(rows: Seq[(String, Long)]) = rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"), max("v").as("mx"))
    val merged = Incremental.merge(
      partial(Seq(("a", 1L), ("b", 2L), ("c", 4L))),
      partial(Seq(("a", 5L), ("b", 7L))),
      Seq("k"), Map("n" -> "sum", "s" -> "sum", "mx" -> "max"))
      .select("k", "n", "s", "mx").orderBy("k").collect().toSeq
    assert(merged == full)
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    def p(rows: (String, Long)*) = rows.toDF("k", "v").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val c = Map("n" -> "sum", "s" -> "sum")
    val left = Incremental.merge(
      Incremental.merge(p("a" -> 1L), p("a" -> 2L, "b" -> 3L), Seq("k"), c),
      p("b" -> 9L), Seq("k"), c)
    val right = Incremental.merge(p("a" -> 1L),
      Incremental.merge(p("a" -> 2L, "b" -> 3L), p("b" -> 9L), Seq("k"), c),
      Seq("k"), c)
    assert(left.orderBy("k").collect().toSeq == right.orderBy("k").collect().toSeq)
  }
}
