package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def versions = Seq(
    // (key, updatedAt, payload)
    ("a", 1L, "a-old"), ("a", 3L, "a-new"), ("a", 2L, "a-mid"),
    ("b", 5L, "b-only"),
    ("c", 7L, "c-old"), ("c", 9L, "c-new")
  ).toDF("k", "updatedAt", "payload")

  test("dedupLatest keeps exactly the newest row per key (D1 DISTINCT ON)") {
    val got = Relational
      .dedupLatest(versions, Seq("k"), Seq($"updatedAt".desc))
      .orderBy($"k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(("a", 3L, "a-new"), ("b", 5L, "b-only"), ("c", 9L, "c-new")))
  }

  test("dedupLatest is idempotent (SURVEY §5 property)") {
    val once = Relational.dedupLatest(versions, Seq("k"), Seq($"updatedAt".desc))
    val twice = Relational.dedupLatest(once, Seq("k"), Seq($"updatedAt".desc))
    assert(once.orderBy($"k").collect().toSeq == twice.orderBy($"k").collect().toSeq)
  }

  test("dedupLatest breaks ties deterministically with a tiebreaker column") {
    val tied = Seq(("a", 1L, "x"), ("a", 1L, "y")).toDF("k", "updatedAt", "payload")
    val got = Relational
      .dedupLatest(tied, Seq("k"), Seq($"updatedAt".desc, $"payload".desc))
      .collect().map(_.getString(2))
    assert(got.toSeq == Seq("y"))
  }

  test("upsert: updates win, new keys insert, untouched keys survive") {
    val base = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v")
    val upd = Seq(("b", 20), ("d", 40)).toDF("k", "v")
    val got = Relational.upsert(base, upd, Seq("k"))
      .orderBy($"k").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("a", 1), ("b", 20), ("c", 3), ("d", 40)))
  }

  test("upsert is idempotent: applying the same batch twice is a no-op") {
    val base = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val upd = Seq(("b", 20)).toDF("k", "v")
    val once = Relational.upsert(base, upd, Seq("k"))
    val twice = Relational.upsert(once, upd, Seq("k"))
    assert(once.orderBy($"k").collect().toSeq == twice.orderBy($"k").collect().toSeq)
  }

  test("upsert with duplicate update keys picks the ordered winner") {
    val base = Seq(("a", 1)).toDF("k", "v")
    val upd = Seq(("a", 10), ("a", 30), ("a", 20)).toDF("k", "v")
    val got = Relational.upsert(base, upd, Seq("k"), Seq($"v".desc))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(got == Seq(("a", 30)))
  }

  test("incrementalFrom returns strictly-after-watermark rows (S3)") {
    val df = Seq(
      (1, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")),
      (3, java.sql.Timestamp.valueOf("2024-01-03 00:00:00"))
    ).toDF("id", "updatedAt")
    val got = Relational
      .incrementalFrom(df, "updatedAt", java.sql.Timestamp.valueOf("2024-01-02 00:00:00"))
      .select($"id")
    assert(col0(got) == List(3))
  }

  test("semiJoin keeps dim rows with a fact match, each once (J6/S4)") {
    val dim = Seq((1, "d1"), (2, "d2"), (3, "d3")).toDF("id", "name")
    val fact = Seq((1, "f"), (1, "g"), (3, "h")).toDF("fid", "v")
    val got = Relational.semiJoin(dim, fact, "id", "fid").orderBy($"id")
    assert(got.columns.toSeq == Seq("id", "name")) // no fact payload leaks
    assert(col0(got) == List(1, 3))
  }

  test("antiJoin keeps dim rows without a fact match (§2.4)") {
    val dim = Seq((1, "d1"), (2, "d2"), (3, "d3")).toDF("id", "name")
    val fact = Seq((1, "f"), (3, "h")).toDF("fid", "v")
    assert(col0(Relational.antiJoin(dim, fact, "id", "fid").orderBy($"id")) == List(2))
  }

  test("topK returns exactly k rows in order and plans as TakeOrderedAndProject") {
    val df = (1 to 100).map(i => (i, i * 7 % 100)).toDF("id", "v")
    val top = Relational.topK(df, 5, Seq($"v".desc, $"id"))
    val got = top.collect().map(r => r.getInt(1))
    assert(got.length == 5 && got.toSeq == got.toSeq.sorted.reverse)
    // the §2.8 scale contract: bounded per-partition heaps, not a global sort
    assert(top.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("skewJoin equals a plain join and spreads a hot key across buckets") {
    // one pathological key carrying most rows
    val fact = ((1 to 500).map(i => ("hot", i)) ++ Seq(("cold", 0), ("cool", 1)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("cold", "C"), ("warm", "W")).toDF("k", "label")
    val plain = fact.join(dim, Seq("k")).groupBy($"k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = Relational.skewJoin(fact, dim, "k").groupBy($"k").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(salted == plain)
    assert(salted("hot") == 500L && salted("cold") == 1L)
  }

  test("latestBy returns the value at the greatest ordering key (A7 max-by)") {
    val df = Seq(("u1", 1L, "open"), ("u1", 9L, "close"), ("u2", 4L, "solo"))
      .toDF("u", "seq", "ev")
    val got = df.groupBy($"u")
      .agg(Relational.latestBy($"ev", $"seq").as("last"))
      .orderBy($"u")
    assert(got.collect().map(_.getString(1)).toSeq == Seq("close", "solo"))
  }

  test("asofJoin matches the greatest prior right row; strict excludes ties") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
      (2L, 50L, "p3")).toDF("k", "lts", "lid")
    val right = Seq((1L, 10L, "c10"), (1L, 15L, "c15"), (1L, 3L, "c3"),
      (3L, 1L, "cX")).toDF("k", "rts", "rid")
    def run(strict: Boolean) =
      Relational.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("rid"), strict)
        .orderBy($"k", $"lts")
        .collect().map(r => (r.getString(2), r.getString(3))).toSeq
    // strict (<): p1@10 sees c3 (c10@10 excluded); p2@20 sees c15;
    // p0@5 sees c3; p3 (key 2) has no right rows → null (left-outer)
    assert(run(strict = true) ==
      Seq(("p0", "c3"), ("p1", "c3"), ("p2", "c15"), ("p3", null)))
    // non-strict (≤): p1@10 now matches c10
    assert(run(strict = false) ==
      Seq(("p0", "c3"), ("p1", "c10"), ("p2", "c15"), ("p3", null)))
  }

  test("asofJoin carries the payload ATOMICALLY: null fields never backfill from older rows") {
    val left = Seq((1L, 20L, "p")).toDF("k", "lts", "lid")
    // the as-of row (ts=10) has extra=NULL; the older row (ts=5) has "x" —
    // the output must NOT be the chimera (rid="b", extra="x")
    val right = Seq((1L, 5L, "a", Some("x")), (1L, 10L, "b", None))
      .toDF("k", "rts", "rid", "extra")
    val got = Relational.asofJoin(left, right, Seq("k"), "lts", "rts",
        Seq("rid", "extra"))
      .select($"rid", $"extra")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1))).toSeq
    assert(got == Seq(("b", null)))
  }

  test("asofJoin plans join-free: one tagged union + one window, no range join") {
    val left = Seq((1L, 10L, "p")).toDF("k", "lts", "lid")
    val right = Seq((1L, 3L, "c")).toDF("k", "rts", "rid")
    val p = Relational.asofJoin(left, right, Seq("k"), "lts", "rts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of degenerated to a join:\n$p")
    assert(p.contains("Window"))
  }

  test("rangeJoin matches [lo, hi) exactly across bin boundaries, equi-join plan") {
    val points = Seq((1L, 100L, 0L), (1L, 101L, 10L), (1L, 102L, 19L),
      (1L, 103L, 20L), (1L, 104L, 35L), (2L, 105L, 10L))
      .toDF("k", "pid", "pt")
    // interval [10, 20) spans bins 1..2 at width 8; [30, 40) spans 3..5
    val intervals = Seq((1L, 900L, 10L, 20L), (1L, 901L, 30L, 40L))
      .toDF("k", "iid", "lo", "hi")
    val got = Relational.rangeJoin(points, intervals, Seq("k"),
        "pt", "lo", "hi", binWidth = 8)
      .select($"pid", $"iid").orderBy($"pid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 101@10 in [10,20); 102@19 in [10,20); 103@20 NOT (exclusive hi);
    // 104@35 in [30,40); 100@0 and key-2 point match nothing
    assert(got == Seq((101L, 900L), (102L, 900L), (104L, 901L)))
    val p = Relational.rangeJoin(points, intervals, Seq("k"),
      "pt", "lo", "hi", 8).queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to nested loop:\n$p")
  }

  test("stratifiedHash sampling is deterministic and partitioning-invariant") {
    val docs = (0 until 2000).map(i => (i.toLong, if (i % 4 == 0) "en" else "de"))
      .toDF("id", "lang")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select($"id").collect().map(_.getLong(0)).toSet
    val s1 = ids(Sampling.stratifiedHash(docs.repartition(1), "id", "lang",
      Map("en" -> 50), 10))
    val s16 = ids(Sampling.stratifiedHash(docs.repartition(16), "id", "lang",
      Map("en" -> 50), 10))
    assert(s1 == s16, "sample membership must not depend on partitioning")
    // per-stratum rates land near target (hash is uniform-ish)
    val en = s1.count(_ % 4 == 0).toDouble / 500
    val de = s1.count(_ % 4 != 0).toDouble / 1500
    assert(en > 0.4 && en < 0.6, s"en rate $en")
    assert(de > 0.05 && de < 0.15, s"de rate $de")
    // widening a rate only ADDS members (stable band edge)
    val wider = ids(Sampling.stratifiedHash(docs, "id", "lang",
      Map("en" -> 80), 10))
    assert(s1.subsetOf(wider))
  }

  test("capPerKey keeps exactly n per key, membership invariant under partitioning") {
    val docs = (0 until 1200).map(i => (i.toLong, s"src${i % 6}"))
      .toDF("id", "src")
    def kept(df: org.apache.spark.sql.DataFrame) =
      Sampling.capPerKey(df, "src", "id", 25)
        .select($"id").collect().map(_.getLong(0)).toSet
    val k1 = kept(docs.repartition(1))
    val k16 = kept(docs.repartition(16))
    assert(k1 == k16, "cap membership must not depend on partitioning")
    val perKey = Sampling.capPerKey(docs, "src", "id", 25)
      .groupBy($"src").count().collect().map(_.getLong(1))
    assert(perKey.length == 6 && perKey.forall(_ == 25L))
    // raising the cap only ADDS members (stable hash order)
    val k50 = Sampling.capPerKey(docs, "src", "id", 50)
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(k1.subsetOf(k50))
  }

  test("toMixture hits the target mixture on the largest feasible subset") {
    // 6000 web / 1000 code / 3000 junk; target web 70% code 30%
    val docs = (0 until 10000).map { i =>
      (i.toLong, if (i % 10 < 6) "web" else if (i % 10 == 6) "code" else "junk")
    }.toDF("id", "domain")
    val kept = Sampling.toMixture(docs, "id", "domain",
      Map("web" -> 7000, "code" -> 3000))
      .groupBy($"domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // code is the binding stratum: T = 1000·10000/3000 = 3333 →
    // expected keeps ≈ web 2333, code 999 (rates are exact; realized
    // counts vary with hash uniformity)
    assert(!kept.contains("junk"), "unlisted strata must be dropped")
    val share = kept("web").toDouble / (kept("web") + kept("code"))
    assert(share > 0.65 && share < 0.75, s"web share $share off target 0.70")
    // binding stratum keeps ~its whole feasible band
    assert(kept("code") > 900)
    // determinism across partitioning
    val a = Sampling.toMixture(docs.repartition(3), "id", "domain",
      Map("web" -> 7000, "code" -> 3000)).select($"id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.toMixture(docs.repartition(17), "id", "domain",
      Map("web" -> 7000, "code" -> 3000)).select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // misuse fails fast
    intercept[IllegalArgumentException](
      Sampling.toMixture(docs, "id", "domain", Map("web" -> 9000, "code" -> 2000)))
    intercept[IllegalArgumentException](
      Sampling.toMixture(docs, "id", "domain", Map("absent" -> 1000)))
    // imbalance beyond the basis-point gate's resolution must fail loudly,
    // not silently drop the dominant stratum (its floored rate would be 0)
    val skewed = ((0 until 60000).map(i => (i.toLong, "big")) :+ (60000L, "tiny"))
      .toDF("id", "domain")
    val e = intercept[IllegalArgumentException](
      Sampling.toMixture(skewed, "id", "domain", Map("big" -> 5000, "tiny" -> 5000)))
    assert(e.getMessage.contains("resolution") || e.getMessage.contains("imbalanced"))
  }

  test("majorityLabel: one winner per key, lexicographic tie-break, exact totals") {
    val votes = Seq(
      ("u1", "a"), ("u1", "a"), ("u1", "b"),          // clear majority a
      ("u2", "b"), ("u2", "c"),                       // tie → b (lexicographic)
      ("u3", "z")                                     // single vote
    ).toDF("user", "lab")
    val got = Relational.majorityLabel(votes, Seq("user"), "lab")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(("u1", "a", 2L, 3L), ("u2", "b", 1L, 2L),
      ("u3", "z", 1L, 1L)))
    // partition-invariant (deterministic under any physical layout)
    val again = Relational.majorityLabel(votes.repartition(7), Seq("user"), "lab")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(again == got)
  }
}
