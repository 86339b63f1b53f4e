package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  private val keys = Seq.fill(2000)(s"k${rnd.nextInt(80)}")
  private def df = keys.toDF("k")

  test("countMin estimates are one-sided: est >= exact for every key") {
    val sketch = Sketch.countMin(df, "k", w = 32, d = 4)
    val probes = df.distinct()
    val est = Sketch.countMinEstimate(sketch, probes, "k", w = 32, d = 4)
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    val bad = est.join(exact, "k").filter(col("est") < col("exact")).count()
    assert(bad == 0)
    // and the tiny width forces at least one visible overcount
    assert(est.join(exact, "k").filter(col("est") > col("exact")).count() > 0)
  }

  test("every lane's counters sum to the row count (nothing lost or duplicated)") {
    val sums = Sketch.countMin(df, "k", w = 32, d = 4)
      .groupBy("lane").agg(sum("cnt").as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sums == (0 until 4).map(_ -> keys.size.toLong).toMap)
  }

  test("sketch is a pure function of the key multiset — partition-invariant") {
    val a = Sketch.countMin(df.repartition(13), "k", 32, 4)
      .orderBy("lane", "bucket").collect().toSeq
    val b = Sketch.countMin(df.coalesce(1), "k", 32, 4)
      .orderBy("lane", "bucket").collect().toSeq
    assert(a == b)
  }

  test("sketches MERGE: sketch(a ++ b) = cellwise sum of the two sketches") {
    val (ka, kb) = keys.splitAt(900)
    val merged = Sketch.countMin(ka.toDF("k"), "k", 32, 4)
      .unionByName(Sketch.countMin(kb.toDF("k"), "k", 32, 4))
      .groupBy("lane", "bucket").agg(sum("cnt").as("cnt"))
      .orderBy("lane", "bucket").collect().toSeq
    val whole = Sketch.countMin(df, "k", 32, 4)
      .orderBy("lane", "bucket").collect().toSeq
    assert(merged == whole)
  }

  test("countMinInnerProduct of disjoint key sets is 0, and empty sketches give 0") {
    // keys chosen to collide in NO lane-bucket cell would be fragile;
    // instead rely on the lane-reattachment contract: a lane with no
    // overlap must pull the min to its true 0 product — two singleton
    // sketches that differ in at least one lane's bucket land on 0
    val a = Sketch.countMin(Seq("only-a").toDF("k"), "k", w = 4096, d = 4)
    val b = Sketch.countMin(Seq("only-b").toDF("k"), "k", w = 4096, d = 4)
    val est = Sketch.countMinInnerProduct(a, b)
      .collect()(0).getDecimal(0).longValueExact()
    assert(est == 0L, s"disjoint singletons estimated $est")
    val empty = Sketch.countMin(df.filter(col("k") === "zzz"), "k", 32, 4)
    assert(Sketch.countMinInnerProduct(empty, empty)
      .collect()(0).getDecimal(0).longValueExact() == 0L)
  }

  test("countMinInnerProduct over-estimates the exact self-join size") {
    val sk = Sketch.countMin(df, "k", w = 32, d = 4)
    val est = Sketch.countMinInnerProduct(sk, sk)
      .collect()(0).getDecimal(0).longValueExact()
    val exact = df.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).collect()(0).getLong(0)
    assert(est >= exact, s"inner product $est under exact $exact")
    // and it is not wildly off: within the CMS w-width error bound
    // est <= exact + n²/w (n = 2000 rows, w = 32)
    assert(est <= exact + keys.size.toLong * keys.size / 32)
  }

  private val manyKeys = (0 until 5000).map(i => s"u$i")

  test("distinctMin estimate lands near the true cardinality") {
    val est = Sketch.distinctEstimate(
        Sketch.distinctMin(manyKeys.toDF("k"), "k", k = 128), k = 128)
      .collect()(0).getLong(0)
    // harmonic combiner over 128 buckets: ~1/sqrt(128) relative error
    assert(est > 3500 && est < 6500, s"est=$est for true 5000")
  }

  test("distinctEstimate of an EMPTY key set is zero") {
    val est = Sketch.distinctEstimate(
        Sketch.distinctMin(manyKeys.toDF("k").filter(col("k") === "nope"),
          "k", k = 64), k = 64)
      .collect()(0).getLong(0)
    assert(est == 0L)
  }

  test("distinctMin ignores multiplicity: duplicates don't move the sketch") {
    val once = Sketch.distinctMin(manyKeys.toDF("k"), "k", 64)
      .orderBy("bucket").collect().toSeq
    val thrice = Sketch.distinctMin(
        (manyKeys ++ manyKeys ++ manyKeys).toDF("k"), "k", 64)
      .orderBy("bucket").collect().toSeq
    assert(once == thrice)
  }

  test("distinctMinPerKey matches the global sketch run per group") {
    val grouped = manyKeys.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("g", "v")
    val per = Sketch.distinctEstimatePerKey(
        Sketch.distinctMinPerKey(grouped.repartition(7), "g", "v", 64), "g", 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Sketch.distinctEstimate(
          Sketch.distinctMin(grouped.filter(col("g") === g).select("v"), "v", 64),
          64)
        .collect()(0).getLong(0)
      assert(per(g) == solo, s"group $g: ${per(g)} vs solo $solo")
    }
  }

  test("countMinWeighted over per-key counts equals countMin over raw rows") {
    val rnd = new scala.util.Random(11)
    val raw = (0 until 4000).map(_ => s"k${rnd.nextInt(300)}")
    val fromRaw = Sketch.countMin(raw.toDF("k"), "k", w = 32, d = 4)
      .orderBy("lane", "bucket").collect().toSeq
    val counts = raw.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      .toSeq.toDF("k", "c")
    val fromCounts = Sketch
      .countMinWeighted(counts.repartition(7), "k", "c", w = 32, d = 4)
      .orderBy("lane", "bucket").collect().toSeq
    assert(fromCounts == fromRaw)
  }

  test("hllEstimate lands within 4 sigma of the true cardinality") {
    val n = 30000
    val vals = (0 until n).map(i => s"v$i")
    val est = Sketch.hllEstimate(
        Sketch.hllRegisters(vals.toDF("k"), "k", m = 1024), m = 1024)
      .collect()(0).getLong(0)
    // sigma = 1.04/sqrt(1024) ~ 3.25%; 4 sigma = 13%
    assert(math.abs(est - n) < n * 0.13, s"est $est vs true $n")
  }

  test("hllRegisters is duplicate-insensitive and partition-invariant") {
    val vals = Seq.fill(5000)(s"u${rnd.nextInt(700)}")
    val once = Sketch.hllRegisters(vals.distinct.toDF("k").coalesce(1),
        "k", m = 256).orderBy("reg").collect().toSeq
    val dup = Sketch.hllRegisters(vals.toDF("k").repartition(11),
        "k", m = 256).orderBy("reg").collect().toSeq
    assert(dup == once)
  }

  test("hllRegisters MERGE by cellwise max") {
    val vals = (0 until 4000).map(i => s"w$i")
    val (va, vb) = vals.splitAt(1500)
    val merged = Sketch.hllRegisters(va.toDF("k"), "k", m = 256)
      .unionByName(Sketch.hllRegisters(vb.toDF("k"), "k", m = 256))
      .groupBy("reg").agg(max("r").cast("int").as("r"))
      .orderBy("reg").collect().toSeq
    val whole = Sketch.hllRegisters(vals.toDF("k"), "k", m = 256)
      .orderBy("reg").collect().toSeq
    assert(merged == whole)
  }

  test("kmv sketch of a union == k-smallest of the merged sketches") {
    val vals = (0 until 3000).map(i => s"k$i")
    val (va, vb) = vals.splitAt(1100)
    val merged = Sketch.kmv(va.toDF("k"), "k", 32)
      .unionByName(Sketch.kmv(vb.toDF("k"), "k", 32))
      .distinct().orderBy("h").limit(32).collect().toSeq
    val whole = Sketch.kmv(vals.toDF("k"), "k", 32)
      .orderBy("h").collect().toSeq
    assert(merged == whole)
  }

  test("kmv is duplicate-insensitive and partition-invariant") {
    val vals = Seq.fill(4000)(s"d${rnd.nextInt(900)}")
    val once = Sketch.kmv(vals.distinct.toDF("k").coalesce(1), "k", 48)
      .orderBy("h").collect().toSeq
    val dup = Sketch.kmv(vals.toDF("k").repartition(9), "k", 48)
      .orderBy("h").collect().toSeq
    assert(dup == once)
  }

  test("kmvSetOps is EXACT when the union sketch is under-full") {
    // |A|=20, |B|=15, |A∩B|=10, |A∪B|=25 — all under k=64
    val a = (0 until 20).map(i => s"s$i")
    val b = (10 until 25).map(i => s"s$i")
    val ska = Sketch.kmv(a.toDF("k"), "k", 64).localCheckpoint()
    val skb = Sketch.kmv(b.toDF("k"), "k", 64).localCheckpoint()
    val r = Sketch.kmvSetOps(ska, skb, 64).collect()(0)
    assert(r.getLong(0) == 25L) // union_est exact
    assert(r.getLong(1) == 10L) // inter_est exact
    assert(r.getLong(2) == 1000000L * 10 / 25) // jaccard_micro exact
  }

  test("kmvSetOps estimates land within 4 sigma at over-full sketches") {
    // two 5000-element sets sharing 2500 keys; k=64 => sigma ~ 1/sqrt(63)
    val a = (0 until 5000).map(i => s"x$i")
    val b = (2500 until 7500).map(i => s"x$i")
    val ska = Sketch.kmv(a.toDF("k"), "k", 64).localCheckpoint()
    val skb = Sketch.kmv(b.toDF("k"), "k", 64).localCheckpoint()
    val r = Sketch.kmvSetOps(ska, skb, 64).collect()(0)
    val trueUnion = 7500.0
    val trueJ = 2500.0 / 7500.0
    assert(math.abs(r.getLong(0) - trueUnion) < trueUnion * 0.5,
      s"union_est ${r.getLong(0)}")
    assert(math.abs(r.getLong(2) / 1e6 - trueJ) < 4 / math.sqrt(63),
      s"jaccard_micro ${r.getLong(2)}")
  }

  test("heavyHitters returns EXACTLY the keys at or above N DIV s") {
    // skewed multiset: key i appears i times, i in 1..80 ⇒ N = 3240, thr = 32
    val vals = (1 to 80).flatMap(i => Seq.fill(i)(s"hh$i"))
    val got = Sketch.heavyHitters(vals.toDF("k").repartition(7), "k", 100L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == (32 to 80).map(i => s"hh$i" -> i.toLong).toMap)
  }

  test("heavyHitters stays exact under a collision-heavy narrow sketch") {
    // w=8 forces massive collisions: the candidate superset balloons but
    // the exact recount must still return precisely {count >= thr}
    val vals = (1 to 60).flatMap(i => Seq.fill(i)(s"c$i")) // N = 1830, thr = 30
    val got = Sketch.heavyHitters(vals.toDF("k"), "k", 60L, w = 8, d = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == (30 to 60).map(i => s"c$i" -> i.toLong).toMap)
  }

  test("distinctMin sketches MERGE by cellwise min") {
    val (ka, kb) = manyKeys.splitAt(2000)
    val merged = Sketch.distinctMin(ka.toDF("k"), "k", 64)
      .unionByName(Sketch.distinctMin(kb.toDF("k"), "k", 64))
      .groupBy("bucket").agg(min("minh").as("minh"))
      .orderBy("bucket").collect().toSeq
    val whole = Sketch.distinctMin(manyKeys.toDF("k"), "k", 64)
      .orderBy("bucket").collect().toSeq
    assert(merged == whole)
  }
}
