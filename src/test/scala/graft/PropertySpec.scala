package graft

import graft.functions.{Scalar, Text}
import graft.operators.Relational
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** SURVEY §5.4 property tests — randomized invariants over the operator
  * library. Column expressions are exercised through real (small) Spark
  * plans so the properties hold for what actually executes, not a Scala
  * re-implementation.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Draw `n` deterministic samples from a generator (seeds 1..n) — the
    * offline cache has scalacheck but not the scalatest bridge. */
  private def forAll[T](gen: Gen[T], n: Int = 15)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val versionsGen: Gen[List[(String, Long, String)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      ts <- Gen.choose(0L, 50L)
      payload <- Gen.alphaStr.map(_.take(5))
    } yield (k, ts, payload))
  } yield rows

  test("dedupLatest: idempotent, one row per key, keeps a maximal timestamp") {
    forAll(versionsGen) { rows =>
      if (rows.nonEmpty) {
        val df = rows.toDF("k", "ts", "p")
        val order = Seq($"ts".desc, $"p".desc)
        val once = Relational.dedupLatest(df, Seq("k"), order)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        // one row per input key
        assert(once.map(_._1).toSet == rows.map(_._1).toSet)
        assert(once.length == rows.map(_._1).distinct.length)
        // each kept row carries its key's max timestamp
        val maxTs = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
        once.foreach { case (k, ts, _) => assert(ts == maxTs(k)) }
        // idempotence
        val twice = Relational
          .dedupLatest(rows.toDF("k", "ts", "p"), Seq("k"), order)
          .transform(d => Relational.dedupLatest(d, Seq("k"), order))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        assert(once.sortBy(_._1).toSeq == twice.sortBy(_._1).toSeq)
      }
    }
  }

  test("gradeInfo: total, monotone, and gpa∈{0,1,1.5,2,2.5,3,3.5,4}") {
    forAll(Gen.listOfN(50, Gen.choose(-50.0, 150.0))) { pcts =>
      if (pcts.nonEmpty) {
        val got = pcts.toDF("pct")
          .select($"pct", Scalar.gradeInfo($"pct").getField("gpa").as("gpa"))
          .collect().map(r => (r.getDouble(0), r.getDouble(1)))
        got.foreach { case (_, gpa) =>
          assert(Set(0.0, 1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0)(gpa))
        }
        // monotone: sort by pct → gpa non-decreasing
        val sorted = got.sortBy(_._1).map(_._2)
        assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
      }
    }
  }

  test("jaccard: bounded, symmetric, 1 iff equal sets (on executed plans)") {
    val setGen = Gen.nonEmptyListOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
    forAll(Gen.listOfN(8, Gen.zip(setGen, setGen))) { pairs =>
      if (pairs.nonEmpty) {
        val df = pairs.toDF("a", "b")
        val got = df.select(
          Text.jaccard($"a", $"b").as("ab"), Text.jaccard($"b", $"a").as("ba"))
          .collect()
        got.zip(pairs).foreach { case (r, (a, b)) =>
          val (ab, ba) = (r.getDouble(0), r.getDouble(1))
          assert(ab >= 0.0 && ab <= 1.0 && ab == ba)
          assert((ab == 1.0) == (a.toSet == b.toSet))
        }
      }
    }
  }

  private val seriesGen: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      nl <- Gen.choose(1, 25)
      nr <- Gen.choose(0, 25)
      kts = for {
        k <- Gen.choose(1L, 4L)
        ts <- Gen.choose(0L, 40L)
      } yield (k, ts)
      ls <- Gen.listOfN(nl, kts)
      rs <- Gen.listOfN(nr, kts)
    } yield (
      ls.zipWithIndex.map { case ((k, ts), i) => (k, ts, 1000L + i) },
      // unique (key, ts) on the right — the as-of determinism contract
      rs.distinctBy(r => (r._1, r._2)).zipWithIndex
        .map { case ((k, ts), i) => (k, ts, 2000L + i) })

  test("asofJoin: equals the brute-force latest-prior row, strict and non-strict") {
    forAll(seriesGen) { case (ls, rs) =>
      val left = ls.toDF("k", "lts", "lid")
      val right = rs.toDF("k", "rts", "rid")
      for (strict <- Seq(true, false)) {
        val got = Relational.asofJoin(left, right, Seq("k"), "lts", "rts",
            Seq("rid"), strict)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
        val want = ls.map { case (k, lts, lid) =>
          val cand = rs.filter(r => r._1 == k &&
            (if (strict) r._2 < lts else r._2 <= lts))
          val best = if (cand.isEmpty) None
            else Some(cand.maxBy(r => (r._2, r._3))._3)
          (k, lts, lid, best)
        }.toSet
        assert(got == want, s"strict=$strict left=$ls right=$rs")
      }
    }
  }

  test("rangeJoin: equals the brute-force interval filter for any bin width") {
    val gen = for {
      (ls, rs) <- seriesGen
      w <- Gen.choose(1L, 15L)
    } yield (ls, rs, w)
    forAll(gen) { case (pts, ivs, w) =>
      val points = pts.toDF("k", "pt", "pid")
      val intervals = ivs.map { case (k, lo, iid) => (k, lo, lo + 7, iid) }
        .toDF("k", "lo", "hi", "iid")
      val got = Relational.rangeJoin(points, intervals, Seq("k"),
          "pt", "lo", "hi", binWidth = w)
        .select($"pid", $"iid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (pk, pt, pid) <- pts
        (ik, lo, iid) <- ivs
        if pk == ik && pt >= lo && pt < lo + 7
      } yield (pid, iid)).toSet
      assert(got == want, s"w=$w pts=$pts ivs=$ivs")
    }
  }

  test("clusters: labels are the connected component's minimum id") {
    val pairsGen = for {
      n <- Gen.choose(1, 20)
      ps <- Gen.listOfN(n, for {
        a <- Gen.choose(0L, 15L)
        b <- Gen.choose(0L, 15L)
        if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield ps.distinct
    forAll(pairsGen, n = 10) { ps =>
      if (ps.nonEmpty) {
        val got = graft.operators.NearDup.clusters(ps.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // brute-force union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        ps.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = ps.flatMap(p => Seq(p._1, p._2)).distinct
        val want = nodes.map { n =>
          n -> nodes.filter(m => find(m) == find(n)).min
        }.toMap
        assert(got == want, s"pairs=$ps")
      }
    }
  }

  test("toMixture: kept set respects targets, nests under scaling, stays feasible") {
    val mixGen: Gen[(Int, Map[String, Int])] = for {
      nRows <- Gen.choose(500, 3000)
      wA <- Gen.choose(1000, 8000)
      wB <- Gen.choose(500, 10000 - wA)
    } yield (nRows, Map("a" -> wA, "b" -> wB))
    forAll(mixGen, n = 8) { case (nRows, weights) =>
      val docs = (0 until nRows)
        .map(i => (i.toLong, if (i % 3 == 0) "a" else "b")).toDF("id", "s")
      val kept = graft.operators.Sampling.toMixture(docs, "id", "s", weights)
        .groupBy($"s").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val a = kept.getOrElse("a", 0L).toDouble
      val b = kept.getOrElse("b", 0L).toDouble
      assert(a + b > 0)
      // realized mixture within hash-uniformity tolerance of the target
      val targetShare = weights("a").toDouble / (weights("a") + weights("b"))
      val share = a / (a + b)
      assert(math.abs(share - targetShare) < 0.12,
        s"share $share vs target $targetShare (weights $weights, n $nRows)")
      // feasibility: no stratum keeps more rows than it has
      assert(a <= (nRows + 2) / 3 && b <= nRows)
    }
  }

  test("weightedTopK: deterministic, partition-invariant, weight-sensitive") {
    val rnd = new scala.util.Random(21)
    val rows = (0 until 2000).map(i => (s"d$i", 1L + rnd.nextInt(1000)))
    val df = rows.toDF("id", "w")
    val a = graft.operators.Sampling.weightedTopK(df.repartition(9), "id", "w", 50)
      .select("id").collect().map(_.getString(0)).toSet
    val b = graft.operators.Sampling.weightedTopK(df.coalesce(1), "id", "w", 50)
      .select("id").collect().map(_.getString(0)).toSet
    assert(a == b && a.size == 50)
    // heavier rows win more often: mean weight of the sample must exceed
    // the population mean (proportional-odds sanity, not exactness)
    val wById = rows.toMap
    val sampleMean = a.map(wById).sum.toDouble / a.size
    val popMean = rows.map(_._2).sum.toDouble / rows.size
    assert(sampleMean > popMean,
      s"sample mean $sampleMean <= population mean $popMean")
  }

  test("weightedTopK: non-positive weights are dropped, never padded in") {
    val df = ((0 until 30).map(i => (s"p$i", 5L))
      ++ Seq(("zero", 0L), ("neg", -3L))).toDF("id", "w")
    // k exceeds the weighted population: the sample must NOT pad with
    // unweightable rows
    val got = graft.operators.Sampling.weightedTopK(df, "id", "w", 32)
      .select("id").collect().map(_.getString(0)).toSet
    assert(!got.contains("zero") && !got.contains("neg") && got.size == 30)
  }

  test("weightedTopKPerKey: k per stratum, consistent with the global sampler") {
    val rnd = new scala.util.Random(33)
    val rows = (0 until 600).map(i => (s"s${i % 4}", s"d$i", 1L + rnd.nextInt(99)))
    val df = rows.toDF("src", "id", "w")
    val got = graft.operators.Sampling.weightedTopKPerKey(df.repartition(7),
        "src", "id", "w", 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got.size == 20 && got.groupBy(_._1).forall(_._2.size == 5))
    // per-stratum winners == global sampler run on that stratum alone
    for (s <- Seq("s0", "s1", "s2", "s3")) {
      val solo = graft.operators.Sampling.weightedTopK(
          df.filter(col("src") === s), "id", "w", 5)
        .collect().map(_.getString(1)).toSet
      assert(got.filter(_._1 == s).map(_._2).toSet == solo, s"stratum $s")
    }
  }

  test("backfill: any op sequence with overlapping date sets folds to the model") {
    // Each op = (requested dates, emitted (date, value) rows — possibly
    // including STRAY dates outside the request). The contract under any
    // sequence, overlaps included: after every op, each requested date
    // holds exactly that op's rows for it (empty recompute = retraction),
    // strays never land, untouched dates survive verbatim.
    val pool = (1 to 5).map(i => java.sql.Date.valueOf(f"2024-02-0$i%d"))
    val opGen = for {
      req <- Gen.someOf(pool.indices).suchThat(_.nonEmpty)
      nRows <- Gen.choose(0, 8)
      rows <- Gen.listOfN(nRows,
        Gen.zip(Gen.oneOf(pool.indices), Gen.choose(0, 999)))
    } yield (req.toList.sorted, rows)
    val seqGen = Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, opGen))
    forAll(seqGen, n = 5) { ops =>
      val dir = java.nio.file.Files.createTempDirectory("backfill_prop").toString
      val out = s"$dir/out"
      // model: date -> multiset of values
      var model = Map.empty[Int, List[Int]].withDefaultValue(Nil)
      ops.foreach { case (req, rows) =>
        graft.pipelines.Runner.backfill(req.map(pool), "day", out) { _ =>
          rows.map { case (di, v) => (pool(di), v) }.toDF("day", "v")
        }
        req.foreach { di =>
          model += di -> rows.filter(_._1 == di).map(_._2)
        }
      }
      val got = spark.read.parquet(out)
        .select(col("day").cast("string"), col("v"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toList
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      val want = model.filter(_._2.nonEmpty)
        .map { case (di, vs) => pool(di).toString -> vs.sorted }
      assert(got == want, s"ops=$ops")
    }
  }

  test("chunks: full coverage, correct starts/sizes for any (n, size, stride)") {
    val gen = for {
      n <- Gen.choose(1, 60)
      size <- Gen.choose(1, 12)
      stride <- Gen.choose(1, size)
    } yield (n, size, stride)
    forAll(gen, n = 12) { case (n, size, stride) =>
      val toks = (1 to n).map(i => s"t$i")
      val got = Seq(Tuple1(toks)).toDF("w")
        .select(explode(Text.chunks($"w", size, stride)).as("c"))
        .select($"c.chunk_id", $"c.toks")
        .collect().map(r => (r.getInt(0), r.getSeq[String](1).toVector)).toVector
      val k = 1 + math.ceil(math.max(n - size, 0).toDouble / stride).toInt
      assert(got.map(_._1) == (0 until k).toVector, s"n=$n size=$size stride=$stride")
      got.foreach { case (i, c) =>
        assert(c == toks.slice(i * stride, i * stride + size).toVector,
          s"chunk $i of n=$n size=$size stride=$stride")
      }
      assert(got.flatMap(_._2).distinct.size == n) // every token covered
    }
  }

  test("majorityLabel: equals the brute-force mode with lexicographic ties") {
    val votesGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0, 3).map(i => s"u$i"), Gen.oneOf("a", "b", "c", "d")))
    forAll(votesGen, n = 10) { votes =>
      val got = graft.operators.Relational
        .majorityLabel(votes.toDF("k", "lab").repartition(5), Seq("k"), "lab")
        .collect().map(r => (r.getString(0),
          (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      val want = votes.groupBy(_._1).map { case (k, vs) =>
        val counts = vs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val (lab, c) = counts.toSeq.minBy { case (l, n) => (-n, l) }
        k -> ((lab, c, vs.size.toLong))
      }
      assert(got == want, s"votes=$votes")
    }
  }

  test("cohenKappa: equals the BigInt model for random label pairs") {
    val pairGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("x", "y", "z"), Gen.oneOf("x", "y", "z", "w")))
    forAll(pairGen, n = 10) { pairs =>
      val r = graft.operators.Stats
        .cohenKappa(pairs.map(p => ("g", p._1, p._2)).toDF("k", "a", "b"),
          Seq("k"), "a", "b")
        .collect()(0)
      val n = BigInt(pairs.size)
      val agree = BigInt(pairs.count(p => p._1 == p._2))
      val ra = pairs.groupBy(_._1).view.mapValues(v => BigInt(v.size)).toMap
      val rb = pairs.groupBy(_._2).view.mapValues(v => BigInt(v.size)).toMap
      val rc = (ra.keySet ++ rb.keySet).toSeq
        .map(l => ra.getOrElse(l, BigInt(0)) * rb.getOrElse(l, BigInt(0))).sum
      assert(BigInt(r.getDecimal(3).toBigInteger) == n * agree - rc)
      assert(BigInt(r.getDecimal(4).toBigInteger) == n * n - rc)
      assert(r.getLong(1) == pairs.size && r.getLong(2) == agree.toLong)
    }
  }

  test("binnedQuantilesPerKey is partition-invariant") {
    val rnd = new scala.util.Random(5)
    val rows = (0 until 2000).map(i => (s"k${i % 4}", rnd.nextInt(5000).toLong))
    val a = graft.operators.Stats
      .binnedQuantilesPerKey(rows.toDF("k", "v").repartition(13), "k", "v",
        32, Seq(500, 900))
      .collect().map(_.toSeq).toSet
    val b = graft.operators.Stats
      .binnedQuantilesPerKey(rows.toDF("k", "v").coalesce(1), "k", "v",
        32, Seq(500, 900))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 8)
  }

  private val tokListGen: Gen[List[String]] = for {
    n <- Gen.choose(0, 12)
    ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e"))
  } yield ws

  test("bigrams: exactly max(n-1, 0) pairs, equal to consecutive zip") {
    forAll(tokListGen) { ws =>
      val got = Seq(Tuple1(ws)).toDF("w")
        .select(Text.bigrams($"w").as("bg"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getString(1)))
      assert(got == ws.zip(ws.drop(1)))
    }
  }

  test("skipgramPairs: symmetric pair multiset, exact count, distance <= window") {
    forAll(tokListGen) { ws =>
      val got = Seq(Tuple1(ws)).toDF("w")
        .select(Text.skipgramPairs($"w", 3).as("p"))
        .collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getString(1)))
      // reference: all ordered pairs at positional distance 1..3
      val want = for {
        i <- ws.indices; o <- (-3 to 3) if o != 0
        j = i + o if j >= 0 && j < ws.length
      } yield (ws(i), ws(j))
      assert(got.sorted == want.sorted)
      // the (c, x) multiset is its own (x, c) mirror
      val m = got.groupBy(identity).view.mapValues(_.size).toMap
      m.foreach { case ((c, x), k) => assert(m((x, c)) == k) }
    }
  }

  private val intervalsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      s <- Gen.choose(0L, 4L * 86400000000L)        // within 4 UTC days
      len <- Gen.choose(0L, 86400000000L * 3 / 2)   // up to 1.5 days — spans midnights
    } yield (s, s + len))
  } yield rows

  test("dailyConcurrencyPeaks matches the single-threaded sweep reference") {
    def day(us: Long): String =
      java.time.LocalDate.ofInstant(
        java.time.Instant.ofEpochMilli(us / 1000), java.time.ZoneOffset.UTC).toString
    forAll(intervalsGen) { iv =>
      // reference: one sorted pass, starts before ends at equal t
      val pts = iv.flatMap { case (s, e) => List((s, 1L), (e, -1L)) }
        .sortBy { case (t, d) => (t, -d) }
      var run = 0L
      val exp = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      pts.foreach { case (t, d) =>
        run += d
        val k = day(t)
        exp(k) = math.max(exp.getOrElse(k, Long.MinValue), run)
      }
      val got = graft.operators.Intervals.dailyConcurrencyPeaks(
          iv.toDF("s_us", "e_us").repartition(7), "s_us", "e_us")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == exp.toMap)
    }
  }

  private val twapGen: Gen[List[(String, Long, Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c")
      us <- Gen.choose(0L, 1000000000L)
      v <- Gen.choose(0L, 50000L)
    } yield (k, us, v))
  } yield rows.zipWithIndex.map { case ((k, us, v), i) => (k, us, i.toLong, v) }

  test("timeWeightedAvg matches the BigInt reference per key") {
    forAll(twapGen) { rows =>
      val exp = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val pairs = sorted.zip(sorted.tail)
        val den = pairs.map { case (a, b) => BigInt(b._2 - a._2) }.sum
        if (pairs.isEmpty || den == 0) None
        else {
          val num = pairs.map { case (a, b) => BigInt(a._4) * (b._2 - a._2) }.sum
          Some(k -> ((num * 1000000 / den).toLong, pairs.size.toLong))
        }
      }
      val got = graft.operators.Stats.timeWeightedAvg(
          rows.toDF("k", "us", "seq", "v").repartition(5),
          Seq("k"), "us", "seq", "v")
        .collect().filter(!_.isNullAt(1))
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == exp)
    }
  }

  test("giniByKey matches the BigInt rank-moment reference and its bounds") {
    val gen = for {
      n <- Gen.choose(1, 50)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("a", "b")
        v <- Gen.choose(0L, 100000L)
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }
    forAll(gen) { rows =>
      val exp = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val xs = rs.sortBy(r => (r._3, r._2)).map(_._3)
        val n = BigInt(xs.size)
        val sx = xs.map(BigInt(_)).sum
        if (sx == 0) None // all-zero group: undefined (operator yields null)
        else {
          val six = xs.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
          Some(k -> ((2 * six - (n + 1) * sx) * 1000000 / (n * sx)).toLong)
        }
      }
      val got = graft.operators.Stats.giniByKey(
          rows.toDF("k", "seq", "v").repartition(5), Seq("k"), "v", "seq")
        .collect().filter(!_.isNullAt(2))
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got == exp)
      // bounds: 0 ≤ G_micro < 10⁶ whenever defined
      got.values.foreach(g => assert(g >= 0L && g < 1000000L))
    }
  }

  test("percentage: in [0, ∞) with 0 exactly when guard trips") {
    forAll(Gen.listOfN(30,
      Gen.zip(Gen.choose(0.0, 100.0), Gen.option(Gen.choose(-10.0, 100.0))))) { rows =>
      if (rows.nonEmpty) {
        val got = rows.toDF("s", "m")
          .select($"s", $"m", Scalar.percentage($"s", $"m").as("p")).collect()
        got.foreach { r =>
          val m = if (r.isNullAt(1)) 100.0 else r.getDouble(1)
          val p = r.getDouble(2)
          if (m <= 0) assert(p == 0.0)
          else assert(math.abs(p - r.getDouble(0) / m * 100) < 1e-9)
        }
      }
    }
  }
}
