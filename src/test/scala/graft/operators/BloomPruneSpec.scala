package graft.operators

import graft.SparkSpec
import graft.plans.BloomContainsExpr
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("no false negatives: every built key probes true (kernel statics)") {
    val keys = (0L until 5000L).map(i => i * 2654435761L + 17)
    val df = keys.toDF("k")
    val model = BloomPrune.build(df, col("k"), mBits = 1 << 16)
    val misses = BloomPrune.filterMembers(df, col("k"), model).count()
    assert(misses == 5000L, "a member key probed false — false negative")
  }

  test("fpp is in the expected range for the sized bit-space") {
    val members = (0L until 4000L).toDF("k")
    val model = BloomPrune.build(members, col("k"), mBits = BloomPrune.sizeFor(4000))
    // disjoint probe set: offset far beyond the member range
    val probes = (1000000L until 1040000L).toDF("k")
    val fp = BloomPrune.filterMembers(probes, col("k"), model).count()
    // sizeFor targets ~1% at k=5; allow generous slack for hash variance
    assert(fp.toDouble / 40000 < 0.05, s"fpp ${fp.toDouble / 40000} too high")
    assert(model.setBits > 0 && model.setBits < model.mBits)
  }

  test("prunedJoin equals the unpruned join exactly (real tables)") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .filter($"c_acctbal" > 7500).select($"c_custkey", $"c_nationkey")
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val pruned = BloomPrune
      .prunedJoin(orders, cust, "o_custkey", "c_custkey", mBits = 1 << 14)
      .select($"o_orderkey", $"c_nationkey").orderBy($"o_orderkey").collect()
    val plain = orders.join(cust, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_nationkey").orderBy($"o_orderkey").collect()
    assert(pruned.toSeq == plain.toSeq)
  }

  test("string keys share the hash space via xxhash64 on both sides") {
    val dim = Seq("alpha", "beta", "gamma").toDF("name")
    val model = BloomPrune.build(dim, col("name"), mBits = 1 << 10)
    val fact = Seq("alpha", "delta", "gamma", "zeta").toDF("name")
    val kept = BloomPrune.filterMembers(fact, col("name"), model)
      .as[String].collect().toSet
    assert(Set("alpha", "gamma").subsetOf(kept), "member string dropped")
  }

  test("driver model and distributed probe agree bit-for-bit") {
    val keys = (0L until 256L).toDF("k")
    val model = BloomPrune.build(keys, col("k"), mBits = 1 << 12)
    val probeKeys = (0L until 512L)
    val dist = BloomPrune.filterMembers(probeKeys.toDF("k"), col("k"), model)
      .as[Long].collect().toSet
    // driver-side contains() over the SAME xxhash64 input hash
    val local = probeKeys.filter { k =>
      val hashed = spark.range(1).select(xxhash64(lit(k))).as[Long].head()
      model.contains(hashed)
    }.toSet
    assert(dist == local)
  }

  test("sizeFor returns a power of two >= 10n") {
    for (n <- Seq(1L, 100L, 4000L, 1000000L)) {
      val m = BloomPrune.sizeFor(n)
      assert((m & (m - 1)) == 0 && m >= math.max(1024L, 10L * n) / 2)
      assert(m >= 1024)
    }
  }

  test("non-bigint key into the kernel fails at analysis time") {
    import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
    val df = Seq("x").toDF("s")
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(toCol(BloomContainsExpr(toExpr(col("s")), Array(0L), 5))).collect()
    }
    assert(bad.getMessage.contains("graft_bloom_might_contain"))
  }

  test("the probe filter sits below the join exchange (plan shape)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a shuffle join so the pre-exchange position is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val cust = spark.read.parquet(s"$sf/customer.parquet")
        .filter($"c_acctbal" > 7500).select($"c_custkey")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
      val plan = BloomPrune
        .prunedJoin(orders, cust, "o_custkey", "c_custkey", mBits = 1 << 14)
        .queryExecution.executedPlan.toString
      val filterAt = plan.indexOf("graft_bloom_might_contain")
      assert(filterAt >= 0, "bloom probe missing from the physical plan")
      // the probe must appear deeper than (after, in tree print order) the
      // exchange that feeds the join — i.e. on the scan side of the shuffle
      val exchangeAt = plan.indexOf("Exchange")
      assert(exchangeAt >= 0 && filterAt > exchangeAt,
        "bloom probe is not below the join exchange")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
