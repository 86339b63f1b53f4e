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

  test("skewProfile: exact counts, rationals, and smallest-key tie-break") {
    // keys: 7×3, 5×3 (tie on count 3 → smallest key 5 wins? no: max count
    // is 3 shared by 5 and 7 → top_key must be 5), 9×1
    val df = (Seq.fill(3)(7L) ++ Seq.fill(3)(5L) ++ Seq(9L)).toDF("k")
    val r = Profile.skewProfile(df.repartition(5), "k").collect()(0)
    assert(r.getLong(0) == 7 && r.getLong(1) == 3 && r.getLong(2) == 3)
    assert(r.getString(3) == "5")
    assert(r.getDecimal(4).longValue == 3 && r.getDecimal(5).longValue == 7)
    // Σc² = 9 + 9 + 1 = 19; n² = 49
    assert(r.getDecimal(6).longValue == 19 && r.getDecimal(7).longValue == 49)
  }

  test("skewProfile: uniform keys give hhi = 1/n_keys exactly") {
    val df = (0L until 40L).map(i => i % 8).toDF("k")
    val r = Profile.skewProfile(df, "k").collect()(0)
    // Σc² / n² = 8·25/1600 = 1/8 = 1/n_keys
    assert(r.getDecimal(6).longValue * r.getLong(1) ==
      r.getDecimal(7).longValue)
  }
}
