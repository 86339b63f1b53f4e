package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("x", 1), ("x", 1), ("x", 2), ("y", 1), ("y", 3), ("z", 3))
    .toDF("s", "i")

  test("topValues ranks by count desc then value asc, per column") {
    val got = Profile.topValues(df, Seq("s", "i"), 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got == Set(
      ("s", "x", 3L, 1), ("s", "y", 2L, 2),
      ("i", "1", 3L, 1), ("i", "3", 2L, 2)))
  }

  test("topValues keeps nulls as a countable group") {
    val withNulls = Seq(Some("a"), None, None, Some("b")).toDF("s")
    val got = Profile.topValues(withNulls, Seq("s"), 3)
      .collect().map(r => (Option(r.getString(1)), r.getLong(2), r.getInt(3)))
    assert(got.contains((None, 2L, 1))) // null is the most frequent value
  }

  test("summary profiles every column in one pass: nulls, distincts, bounds") {
    val withNulls = Seq(
      (Some("b"), Some(2)), (None, Some(1)), (Some("a"), None), (Some("a"), Some(3)))
      .toDF("s", "i")
    val got = Profile.summary(withNulls, Seq("s", "i"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5))))
      .toMap
    assert(got("s") == ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(got("i") == ((4L, 1L, 3L, Some("1"), Some("3"))))
  }

  test("topValues ties break on value — deterministic under repartitioning") {
    val ties = Seq("b", "a", "c", "a", "b", "c").toDF("s")
    val r1 = Profile.topValues(ties.repartition(7), Seq("s"), 3)
      .orderBy("rk").collect().map(_.getString(1)).toSeq
    assert(r1 == Seq("a", "b", "c"))
  }
}
