package graft.operators

import graft.SparkSpec

class StatsSpec extends SparkSpec {
  import spark.implicits._

  /** Reference flag in exact BigInt arithmetic — the operator's inequality
    * recomputed independently. */
  private def bruteFlags(xs: Seq[Long], z10: Int): Set[Long] = {
    val n = BigInt(xs.size)
    val s1 = xs.map(BigInt(_)).sum
    val s2 = xs.map(x => BigInt(x) * x).sum
    val nVar = n * s2 - s1 * s1
    xs.filter { x =>
      val dev = (n * x - s1) * 10
      dev * dev > BigInt(z10.toLong * z10) * nVar
    }.toSet
  }

  private def gotFlags(xs: Seq[Long], z10: Int): Set[Long] =
    Stats.sigmaOutliers(
        xs.zipWithIndex.map { case (x, i) => (i.toLong, "g", x) }
          .toDF("row_id", "grp", "v").repartition(5),
        Seq("grp"), "v", z10)
      .collect().map(_.getAs[Long]("v")).toSet

  test("sigmaOutliers flags the obvious tail point and nothing else") {
    // a lone outlier among n points caps at z = (n−1)/√n, so n must be
    // ≥ 11 before ANY single point can exceed 3σ — use 20
    val xs = Seq.fill(19)(Seq[Long](10, 11, 9, 12, 8)).flatten.take(19) :+ 1000L
    assert(gotFlags(xs, 30) == Set(1000L))
    assert(gotFlags(xs, 30) == bruteFlags(xs, 30))
  }

  test("sigmaOutliers: strict inequality — the exact boundary is NOT flagged") {
    // two-point group {0, 2m}: μ=m, σ=m, so each point sits at EXACTLY 1σ;
    // z10=10 (1.0σ) must flag nothing, z10=9 must flag both
    val xs = Seq[Long](0, 2000000)
    assert(gotFlags(xs, 10).isEmpty)
    assert(gotFlags(xs, 9) == Set(0L, 2000000L))
  }

  test("sigmaOutliers assertBudget: passes in-budget, fails loudly past 1e18") {
    val ok = Seq[Long](10, 11, 9, 12, 1000).zipWithIndex
      .map { case (x, i) => (i.toLong, "g", x) }.toDF("row_id", "grp", "v")
    // in budget: behaves identically to the unchecked path
    assert(Stats.sigmaOutliers(ok, Seq("grp"), "v", 30, assertBudget = true)
      .collect().length ==
      Stats.sigmaOutliers(ok, Seq("grp"), "v", 30).collect().length)
    // n*|x|_max = 3 * 10^18 > 1e18: must throw, not silently drop rows
    val over = Seq[Long](1000000000000000000L, -1000000000000000000L, 7L)
      .zipWithIndex.map { case (x, i) => (i.toLong, "g", x) }
      .toDF("row_id", "grp", "v")
    val e = intercept[IllegalArgumentException] {
      Stats.sigmaOutliers(over, Seq("grp"), "v", 30, assertBudget = true)
    }
    assert(e.getMessage.contains("magnitude budget"))
  }

  test("sigmaOutliers matches the BigInt reference on random data per group") {
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(500)(rnd.nextInt(10000).toLong) ++ Seq(900000L, -800000L)
    for (z10 <- Seq(15, 30, 45))
      assert(gotFlags(xs, z10) == bruteFlags(xs, z10), s"z10=$z10")
  }

  /** Reference MAD flags via exact BigDecimal quartile interpolation. */
  private def bruteMad(xs: Seq[Long], k: Int): Set[Long] = {
    def median(vs: Seq[BigDecimal]): BigDecimal = {
      val s = vs.sorted
      val lo = (s.size - 1) / 2
      if (s.size % 2 == 1) s(lo) else (s(lo) + s(lo + 1)) / 2
    }
    val med = median(xs.map(BigDecimal(_)))
    val devs = xs.map(x => (BigDecimal(x) - med).abs)
    val mad = median(devs)
    xs.zip(devs).filter { case (_, d) => d > mad * k }.map(_._1).toSet
  }

  private def gotMadFlags(xs: Seq[Long], k: Int): Set[Long] = {
    import spark.implicits._
    Stats.madOutliers(
        xs.zipWithIndex.map { case (x, i) => (i.toLong, "g", x) }
          .toDF("id", "g", "x").repartition(5),
        Seq("g"), "x", k)
      .collect().map(_.getLong(2)).toSet
  }

  test("madOutliers: a lone extreme flags; the median mass never does") {
    val xs = Seq.fill(20)(Seq[Long](10, 11, 9, 12, 8)).flatten.take(21) :+ 5000L
    assert(gotMadFlags(xs, 8) == Set(5000L))
    assert(gotMadFlags(xs, 8) == bruteMad(xs, 8))
  }

  test("madOutliers survives contamination that masks sigmaOutliers") {
    // two colluding extremes inflate σ enough to hide each other at 3σ
    // (n=12: a pair at z ≈ 2.2σ each) — MAD flags both regardless
    val xs = Seq[Long](10, 11, 9, 12, 8, 10, 11, 9, 12, 8, 100000, 100000)
    assert(gotFlags(xs, 30).isEmpty)
    assert(gotMadFlags(xs, 8) == Set(100000L))
  }

  test("madOutliers matches the exact-interpolation reference on random data") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(5, 6, 501, 502); k <- Seq(4, 8)) {
      val xs = Seq.fill(n)(rnd.nextInt(1000).toLong) ++ Seq(50000L, -40000L)
      assert(gotMadFlags(xs, k) == bruteMad(xs, k), s"n=$n k=$k")
    }
  }

  test("trendExact: rising, falling, and flat series get exact signed slopes") {
    val df = Seq(
      // rising: y = 2x → slope_num/slope_den = 2 exactly
      ("up", 1L, 2L), ("up", 2L, 4L), ("up", 3L, 6L),
      // falling: y = 10 − x
      ("dn", 1L, 9L), ("dn", 2L, 8L), ("dn", 3L, 7L),
      // flat
      ("fl", 1L, 5L), ("fl", 2L, 5L), ("fl", 3L, 5L))
      .toDF("k", "x", "y")
    val got = Stats.trendExact(df, Seq("k"), "x", "y")
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).longValueExact(), r.getDecimal(3).longValueExact()))
      .toMap
    // n=3, Σx=6, Σx²=14 → den = 3·14 − 36 = 6 for every group
    assert(got("up") == ((3L, 12L, 6L))) // slope exactly 2
    assert(got("dn") == ((3L, -6L, 6L))) // slope exactly −1
    assert(got("fl") == ((3L, 0L, 6L)))
  }

  test("chiSquareCells: independent columns give chi_num 0 in every cell") {
    // perfectly balanced 2×2: o = r·c/n everywhere → n·o − r·c = 0
    val df = Seq(("a", 0), ("a", 1), ("b", 0), ("b", 1)).toDF("u", "v")
    val got = Stats.chiSquareCells(df, "u", "v").collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getAs[java.math.BigDecimal]("chi_num").longValueExact() == 0L)
      assert(r.getAs[java.math.BigDecimal]("chi_den").longValueExact() == 16L) // n·r·c = 4·2·2
    }
  }

  test("chiSquareCells matches a BigInt reference on a skewed table") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(300)((s"t${rnd.nextInt(3)}", rnd.nextInt(4)))
    val n = BigInt(rows.size)
    val cells = rows.groupBy(identity).map { case ((a, b), o) => (a, b, BigInt(o.size)) }
    val rm = rows.groupBy(_._1).map { case (a, o) => a -> BigInt(o.size) }
    val cm = rows.groupBy(_._2).map { case (b, o) => b -> BigInt(o.size) }
    val expected = cells.map { case (a, b, o) =>
      val dev = n * o - rm(a) * cm(b)
      (a, b) -> (o.toLong, dev * dev, n * rm(a) * cm(b))
    }.toMap
    val got = Stats.chiSquareCells(rows.toDF("u", "v"), "u", "v")
      .collect().map { r =>
        (r.getString(0), r.getInt(1)) -> (r.getLong(2),
          BigInt(r.getAs[java.math.BigDecimal]("chi_num").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("chi_den").toBigInteger))
      }.toMap
    assert(got == expected)
  }

  test("sigmaOutliers is per-group: a tail in one group never flags another") {
    // group b is a balanced two-level series: every point sits at exactly
    // 1σ, so nothing in b can be flagged at 3σ no matter what a contains
    val df = (Seq.fill(50)(("a", 10L)) ++ Seq(("a", 100000L))
      ++ Seq.fill(25)(("b", 10L)) ++ Seq.fill(25)(("b", 20L)))
      .toDF("grp", "v")
    val got = Stats.sigmaOutliers(df, Seq("grp"), "v", 30)
      .select("grp", "v").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet == Set(("a", 100000L)))
  }

  test("correlationExact: perfect linear y=3x+7 gives corr_num² = den_x·den_y") {
    val rows = (0 until 40).map(i => ("g", i.toLong, 3L * i + 7))
    val r = Stats.correlationExact(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect()(0)
    val (num, dx, dy) = (BigInt(r.getAs[java.math.BigDecimal]("corr_num").toBigInteger),
      BigInt(r.getAs[java.math.BigDecimal]("corr_den_x").toBigInteger),
      BigInt(r.getAs[java.math.BigDecimal]("corr_den_y").toBigInteger))
    assert(num > 0 && num * num == dx * dy) // corr² == 1 exactly
  }

  test("correlationExact matches an independent BigInt reference per group") {
    val rnd = new scala.util.Random(3)
    val rows = (0 until 200).map(i =>
      (s"g${i % 3}", rnd.nextInt(1000).toLong, rnd.nextInt(50).toLong))
    val expected = rows.groupBy(_._1).map { case (g, rs) =>
      val n = BigInt(rs.size)
      val sx = rs.map(r => BigInt(r._2)).sum
      val sy = rs.map(r => BigInt(r._3)).sum
      val sxy = rs.map(r => BigInt(r._2) * r._3).sum
      val sxx = rs.map(r => BigInt(r._2) * r._2).sum
      val syy = rs.map(r => BigInt(r._3) * r._3).sum
      g -> (rs.size.toLong, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
    }
    val got = Stats.correlationExact(rows.toDF("g", "x", "y").repartition(7),
        Seq("g"), "x", "y")
      .collect().map { r =>
        r.getString(0) -> (r.getLong(1),
          BigInt(r.getAs[java.math.BigDecimal]("corr_num").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("corr_den_x").toBigInteger),
          BigInt(r.getAs[java.math.BigDecimal]("corr_den_y").toBigInteger))
      }.toMap
    assert(got == expected)
  }

  test("binnedQuantiles brackets the exact quantile for every q") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(4000)(rnd.nextInt(100000).toLong)
    val qs = Seq(100, 500, 900, 990)
    val got = Stats.binnedQuantiles(xs.toDF("v"), "v", nBins = 64, qs)
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val sorted = xs.sorted
    for (q <- qs) {
      // exact q-quantile under the cum*1000 >= q*n rule: the ceil(q*n/1000)-th value
      val exact = sorted((q * xs.size + 999) / 1000 - 1)
      val (lo, hi, cum) = got(q)
      assert(lo <= exact && exact <= hi, s"q=$q exact=$exact not in [$lo,$hi]")
      // cum_rows really is the count ≤ bin_hi
      assert(cum == sorted.count(_ <= hi).toLong)
    }
  }

  test("binnedQuantiles bin edges partition the value range exactly") {
    // every input value must fall in exactly one [bin_lo, bin_hi], and the
    // selected bins' edges must be consistent with the binning formula
    val xs = (0L to 1000L).toSeq
    val got = Stats.binnedQuantiles(xs.toDF("v"), "v", nBins = 7, Seq(1, 1000))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val byQ = got.map(r => r._1 -> r).toMap
    assert(byQ(1)._2 == 0 && byQ(1)._3 == 0L) // p0.1 sits in the first bin
    assert(byQ(1000)._2 == 6 && byQ(1000)._4 == 1000L) // p100 ends the range
    // widths differ by at most 1 (integer split of 1001 into 7 bins)
    val widths = got.map(r => r._4 - r._3 + 1)
    assert(widths.forall(w => w == 143 || w == 144))
  }

  test("binnedQuantiles is partition-invariant") {
    val xs = Seq.fill(500)(scala.util.Random.nextInt(1000).toLong)
    val a = Stats.binnedQuantiles(xs.toDF("v").repartition(11), "v", 16,
      Seq(500)).collect().toSeq
    val b = Stats.binnedQuantiles(xs.toDF("v").coalesce(1), "v", 16,
      Seq(500)).collect().toSeq
    assert(a == b)
  }

  test("binnedQuantilesPerKey: each group equals the global operator run alone") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 3000).map(i =>
      (s"k${i % 3}", (rnd.nextInt(100000) - 17).toLong))
    val df = rows.toDF("k", "v")
    val qs = Seq(250, 500, 990)
    val got = Stats.binnedQuantilesPerKey(df.repartition(11), "k", "v", 64, qs)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    for (k <- Seq("k0", "k1", "k2")) {
      val solo = Stats.binnedQuantiles(df.filter($"k" === k), "v", 64, qs)
        .collect()
        .map(r => (k, r.getInt(0)) ->
          (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
        .toMap
      solo.foreach { case (key, want) => assert(got(key) == want, s"$key") }
    }
    assert(got.size == 9)
  }

  test("cohenKappa: perfect agreement gives kappa_num = kappa_den > 0") {
    val df = Seq(("g", "x", "x"), ("g", "y", "y"), ("g", "x", "x"))
      .toDF("k", "a", "b")
    val r = Stats.cohenKappa(df, Seq("k"), "a", "b").collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 3) // n, agree
    val (num, den) = (r(0).getDecimal(3), r(0).getDecimal(4))
    assert(num == den && num.longValue > 0) // kappa = 1 exactly
  }

  test("cohenKappa matches the hand formula, incl. one-sided labels") {
    // rater A uses {x, y}, rater B additionally uses z (one-sided label):
    // pairs (x,x) (x,x) (x,y) (y,z) (y,y)
    val df = Seq(("x", "x"), ("x", "x"), ("x", "y"), ("y", "z"), ("y", "y"))
      .map { case (a, b) => ("g", a, b) }.toDF("k", "a", "b")
    val r = Stats.cohenKappa(df, Seq("k"), "a", "b").collect()(0)
    // n=5 agree=3; rA: x=3 y=2, rB: x=2 y=2 z=1; rc = 3·2 + 2·2 = 10
    assert(r.getLong(1) == 5 && r.getLong(2) == 3)
    assert(r.getDecimal(3).longValue == 5 * 3 - 10) // 5
    assert(r.getDecimal(4).longValue == 5 * 5 - 10) // 15 → kappa = 1/3
  }
}
