package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: the same integral recurrence in plain
    * Scala over adjacency maps. */
  private def localPageRank(edges: Seq[(String, String)], iters: Int): Map[String, Long] = {
    val e = edges.distinct
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val incoming = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / outdeg(src) }.sum
      }
      rank = nodes.map(n =>
        n -> incoming.get(n).map(s => 150000L + (850L * s) / 1000L).getOrElse(150000L)).toMap
    }
    rank
  }

  private val diamond = Seq(
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"))

  test("pageRank matches the integral recurrence on a hand-checkable graph") {
    val got = Graph.pageRank(diamond.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == localPageRank(diamond, 3))
    // the hub receiving two feeds outranks its feeders
    assert(got("d") > got("b") && got("d") > got("c"))
  }

  test("ranks are a pure function of the graph — invariant to partitioning") {
    val df1 = diamond.toDF("src", "dst").repartition(1)
    val df7 = diamond.toDF("src", "dst").repartition(7)
    val a = Graph.pageRank(df1, 4).collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val b = Graph.pageRank(df7, 4).collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("duplicate edges collapse; sink-only nodes keep base mass") {
    // z has no outgoing edge: it must survive with rank from its feeder;
    // y has no incoming edge: base mass 150000 after the first iteration
    val edges = Seq(("y", "z"), ("y", "z"), ("y", "w")).toDF("src", "dst")
    val got = Graph.pageRank(edges, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set("y", "z", "w"))
    assert(got("y") == 150000L)
    assert(got == localPageRank(Seq(("y", "z"), ("y", "w")), 2))
  }

  test("total mass stays bounded (no double-counting from multi-edges)") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((s"n${rnd.nextInt(30)}", s"n${rnd.nextInt(30)}"))
      .filter(e => e._1 != e._2)
    val got = Graph.pageRank(edges.toDF("src", "dst"), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == localPageRank(edges, 3))
  }
}
