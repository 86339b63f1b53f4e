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

  test("sigmaOutliers matches the BigInt reference on random data per group") {
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(500)(rnd.nextInt(10000).toLong) ++ Seq(900000L, -800000L)
    for (z10 <- Seq(15, 30, 45))
      assert(gotFlags(xs, z10) == bruteFlags(xs, z10), s"z10=$z10")
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
}
