package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Date

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  private val obs = Seq(
    ("a", d("2024-01-02"), 10L),
    ("a", d("2024-01-05"), 20L),
    ("b", d("2024-01-03"), 7L))
    .toDF("k", "day", "v")

  private val spine = TimeSeries.dailySpine(
    Seq("a", "b").toDF("k"),
    Seq((d("2024-01-01"), d("2024-01-06"))).toDF("lo", "hi"),
    "k", "lo", "hi", "day")

  test("dailySpine is the dense key × calendar cross product") {
    assert(spine.count() == 2 * 6)
    assert(spine.select("day").distinct().count() == 6)
  }

  test("gapFillLocf carries forward, leaves leading gaps null, flags observed") {
    val got = TimeSeries.gapFillLocf(obs, spine, "k", "day", "v")
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getInt(3)))
      .toSet
    val expected = Set(
      ("a", "2024-01-01", None, 0),
      ("a", "2024-01-02", Some(10L), 1),
      ("a", "2024-01-03", Some(10L), 0),
      ("a", "2024-01-04", Some(10L), 0),
      ("a", "2024-01-05", Some(20L), 1),
      ("a", "2024-01-06", Some(20L), 0),
      ("b", "2024-01-01", None, 0),
      ("b", "2024-01-02", None, 0),
      ("b", "2024-01-03", Some(7L), 1),
      ("b", "2024-01-04", Some(7L), 0),
      ("b", "2024-01-05", Some(7L), 0),
      ("b", "2024-01-06", Some(7L), 0))
    assert(got == expected)
  }

  test("gapFillLocf fills are invariant to input partitioning") {
    val a = TimeSeries.gapFillLocf(obs.repartition(7), spine.repartition(3),
        "k", "day", "v")
      .orderBy("k", "day").collect().toSeq
    val b = TimeSeries.gapFillLocf(obs.coalesce(1), spine.coalesce(1),
        "k", "day", "v")
      .orderBy("k", "day").collect().toSeq
    assert(a == b)
  }

  private def unionOf(iv: Seq[(String, Long, Long)]) =
    TimeSeries.intervalUnion(iv.toDF("k", "s", "e"), "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("intervalUnion merges overlaps and touching endpoints, keeps gaps") {
    val got = unionOf(Seq(
      ("a", 1L, 5L), ("a", 3L, 8L), // overlap -> [1,8]
      ("a", 8L, 10L), // closed-interval touch -> extends to [1,10]
      ("a", 12L, 13L), // gap -> own island
      ("b", 2L, 4L))) // other key untouched
    assert(got == Set(("a", 1L, 10L), ("a", 12L, 13L), ("b", 2L, 4L)))
  }

  test("intervalUnion handles containment and duplicate intervals") {
    val got = unionOf(Seq(
      ("a", 1L, 10L), ("a", 3L, 4L), ("a", 3L, 4L), // contained + dup
      ("a", 20L, 20L), ("a", 20L, 20L))) // duplicate points
    assert(got == Set(("a", 1L, 10L), ("a", 20L, 20L)))
  }

  test("intervalUnion is partition-invariant") {
    val rnd = new scala.util.Random(5)
    val iv = Seq.fill(300)(("k" + rnd.nextInt(5),
      rnd.nextInt(100).toLong, 0L)).map { case (k, s, _) =>
      (k, s, s + rnd.nextInt(10)) }
    val a = unionOf(iv)
    val b = TimeSeries.intervalUnion(iv.toDF("k", "s", "e").repartition(13),
        "k", "s", "e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
    // merged islands are pairwise disjoint with real gaps between them
    for ((k, ivs) <- a.groupBy(_._1)) {
      val sorted = ivs.toSeq.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, e1), (_, s2, _)) => assert(s2 > e1 + 0, s"key $k")
        case _ =>
      }
    }
  }
}
