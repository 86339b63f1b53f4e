package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

/** [[Packing]] — the distributed prefix-sum contract: bit-equality with the
  * single-partition window form for ANY bucket count and partitioning, and
  * a physical plan whose windows are all PARTITIONED (the single-partition
  * global window is exactly what the operator exists to avoid).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def sample(n: Int): Seq[(Long, Long)] =
    (0 until n).map { i =>
      // deterministic ragged values, including zeros
      (i * 7L % 997L * 1000L + i, (i * i * 31L + i) % 313L)
    }

  private def reference(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    rows.sortBy(_._1).map { case (id, v) => acc += v; id -> acc }.toMap
  }

  test("globalCumSum equals the single-window form for any bucket count") {
    val rows = sample(500)
    val expect = reference(rows)
    for (b <- Seq(1, 3, 64, 200)) {
      val got = Packing.globalCumSum(rows.toDF("id", "v"), "id", "v", buckets = b)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expect, s"buckets=$b diverged from the global window")
    }
  }

  test("globalCumSum is invariant under input partitioning") {
    val rows = sample(300)
    val expect = reference(rows)
    for (p <- Seq(1, 7, 32)) {
      val got = Packing.globalCumSum(
        rows.toDF("id", "v").repartition(p), "id", "v", buckets = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == expect, s"repartition($p) changed the running total")
    }
  }

  test("null values count as zero, not null-poisoned totals") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "v")
    val got = Packing.globalCumSum(df, "id", "v", buckets = 4)
      .orderBy("id").collect().map(_.getLong(2)).toSeq
    assert(got == Seq(5L, 5L, 12L))
  }

  test("packByBudget assigns the shard holding the first token; shards are monotone") {
    val rows = sample(400)
    val budget = 512L
    val out = Packing.packByBudget(rows.toDF("id", "v"), "id", "v", budget,
      buckets = 16).orderBy("id").collect()
    var prev = -1L
    out.foreach { r =>
      val (v, cum, shard) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(shard == (cum - v) / budget, "shard must be (cum - v) div budget")
      assert(shard >= prev, "shard ids must be monotone in pack order")
      prev = shard
    }
    val expect = reference(rows)
    out.foreach(r => assert(r.getLong(2) == expect(r.getLong(0))))
  }

  test("every window in the plan is partitioned — no single-partition global scan") {
    val df = Packing.globalCumSum(sample(100).toDF("id", "v"), "id", "v",
      buckets = 8)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LogicalWindow => w
    }
    assert(windows.nonEmpty, "expected the bucketed window in the plan")
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      "global (unpartitioned) window found — the 100 TB anti-pattern"))
  }

  test("packSpans: every shard holds exactly budget tokens except the last") {
    val rows = sample(300)
    val budget = 256L
    val total = rows.map(_._2).sum
    val spans = Packing.packSpans(rows.toDF("id", "v"), "id", "v", budget,
      buckets = 8)
    val perShard = spans.groupBy("shard")
      .agg(org.apache.spark.sql.functions.sum("tok_in_shard").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lastShard = perShard.keys.max
    assert(perShard.keys.toSeq.sorted == (0L to lastShard),
      "shards must be contiguous from 0")
    perShard.foreach { case (shard, t) =>
      if (shard < lastShard)
        assert(t == budget, s"shard $shard holds $t tokens, expected $budget")
    }
    assert(perShard.values.sum == total, "span split must conserve tokens")
    // per-document conservation: the split pieces sum back to the value
    val perDoc = spans.groupBy("id")
      .agg(org.apache.spark.sql.functions.sum("tok_in_shard").as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.filter(_._2 > 0).foreach { case (id, v) =>
      assert(perDoc(id) == v, s"doc $id split into ${perDoc(id)} of $v tokens")
    }
    // zero-token rows occupy no interval and must not appear
    assert(rows.filter(_._2 == 0).forall(r => !perDoc.contains(r._1)))
  }

  test("degenerate inputs: empty frame and a single row") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("id", "v")
    assert(Packing.globalCumSum(empty, "id", "v").count() == 0)
    val one = Packing.globalCumSum(Seq((9L, 4L)).toDF("id", "v"), "id", "v")
      .collect()
    assert(one.head.getLong(2) == 4L)
  }
}
