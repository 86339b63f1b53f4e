package graft

import graft.functions.Vectors

/** Pinned candidate-count budgets — the wall-time-independent scale
  * assertions (VERDICT r7 ask #3): SCALE.md's growth conclusions rest on
  * calibrated wall-clock pairs, and the four-run spread showed those swing
  * ±3× under host contention. The STRUCTURAL quantities behind them do
  * not: each dedup/ANN/retrieval family's candidate cardinality is a
  * deterministic function of the data and the pruning policy, so a policy
  * regression (a lost gate, a degenerate band, a correlated lattice) moves
  * these counts by orders of magnitude on any host.
  *
  * Scale axis: [[ScaleUp]] copies of sf0.001. Copy 0 is verbatim and
  * copies are disjoint-vocabulary tenants (ScaleUpSpec pins the
  * invariants), so each budget below is derived from its family's CLAIMED
  * asymptote on that structure — not from a wall clock:
  *  - q31/q32/q167: linear in copies (disjoint vocabularies ⇒ candidate
  *    structure replicates per copy; band/prefix membership is hash-order
  *    dependent, so copies are statistical redraws — slack 3 covers that,
  *    while the failure modes (lost prefix filter, degenerate band key,
  *    fixed band geometry) are ≥ k× over).
  *  - q41: the ANALYTIC two-table collision background of the adaptive
  *    lattice, 2·n²/2^planes(n) — the exact quantity
  *    [[Vectors.adaptivePlanes]] exists to bound (round 6's correlated
  *    lattice held candidates ~n²/22 regardless of plane count: ≥ 6× over
  *    this budget already at 2 000 vectors).
  *  - q120: per-copy candidate rate CONSTANT beyond the first tenant step
  *    (adding disjoint tenants dilutes every tenant's terms below the
  *    global 75% cutoff — a documented ONE-TIME step, q120 scaladoc — so
  *    the k = 1 → 2 ratio is not linear, but k = 2 → 4 must be), plus the
  *    gate must cut the ungated posting volume by ≥ 4× (a lost tenant
  *    gate reverts to ungated stopword floods: the measured 1,494 → 44.8M
  *    step at 10 tenants).
  *
  * The counts come from the PRODUCTION seams (`QueriesExt.q*Candidates`)
  * — the queries consume the same derivations, so the spec cannot drift
  * from the shipped policy.
  */
class CandidateBudgetSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"
  private val slack = 3.0

  // one generated directory per scale factor, built on first use — the
  // budget math below derives the dataset from k, so a future k != 4
  // caller cannot silently compare x4 counts against a k-x budget
  // (ADVICE r8)
  private val scaled = scala.collection.mutable.Map.empty[Int, String]
  private def scaleTo(k: Int): String = scaled.getOrElseUpdate(k, {
    val d = java.nio.file.Files.createTempDirectory(s"graft_cand_x$k")
      .toString
    ScaleUp.run(spark, base, d, k)
    d
  })
  private lazy val x2 = scaleTo(2)
  private lazy val x4 = scaleTo(4)

  private def linearBudget(name: String, k: Int,
      cand: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Unit = {
    val c1 = cand(spark, base).count()
    val ck = cand(spark, scaleTo(k)).count()
    info(s"$name: base=$c1 x$k=$ck (linear would be ${k * c1})")
    assert(c1 > 0, s"$name: the base candidate set is empty — the budget " +
      "would be vacuous (data or derivation changed?)")
    // copy 0 is verbatim: every base candidate must survive
    assert(ck >= c1, s"$name: scaled candidates $ck < base $c1 — the " +
      "scaled corpus lost the verbatim copy's structure")
    assert(ck <= slack * k * c1,
      s"$name: candidates grew ${ck.toDouble / c1}x at ${k}x data — " +
        s"over the linear budget ${slack * k * c1} (pruning policy regression?)")
  }

  test("q31 prefix-join candidates stay in the linear band") {
    linearBudget("q31_prefix", 4, QueriesExt.q31Candidates)
  }

  test("q32 MinHash-LSH candidates stay in the linear band") {
    linearBudget("q32_lsh", 4, QueriesExt.q32Candidates)
  }

  test("q167 banded-Hamming collision rows stay in the linear band") {
    linearBudget("q167_bands", 4, QueriesExt.q167Candidates)
  }

  test("q41 lattice candidates stay under the analytic collision background") {
    // candidates ≈ true pairs + the two seeded tables' random background
    // n²/2^planes each; adaptivePlanes raises planes with n so the
    // background is ≤ 64n asymptotically. At these n the 8-plane floor
    // binds and the tight form is n²/256 — assert against the policy's own
    // analytic bound, which the correlated lattice (round 6) violated 6×
    // at 2,000 vectors and 220× at 20,000.
    for ((dir, label) <- Seq(base -> "base", x4 -> "x4")) {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val planes = Vectors.adaptivePlanes(n)
      val budget = (2.5 * 2 * n.toDouble * n.toDouble /
        math.pow(2, planes)).toLong
      val c = QueriesExt.q41Candidates(spark, dir).count()
      info(s"q41_lattice[$label]: n=$n planes=$planes cand=$c budget=$budget")
      assert(c > 0, s"q41[$label]: empty candidate set — vacuous budget")
      assert(c <= budget,
        s"q41[$label]: $c candidates exceed the analytic lattice " +
          s"background $budget — independent-hyperplane scaling broken?")
    }
  }

  test("q120 post-gate candidates: constant per-copy rate past the tenant step") {
    val c2 = QueriesExt.q120Candidates(spark, x2).count()
    val c4 = QueriesExt.q120Candidates(spark, x4).count()
    info(s"q120_postgate: x2=$c2 x4=$c4 (linear from x2 would be ${2 * c2})")
    assert(c2 > 0, "q120: empty x2 candidate set — vacuous budget")
    // beyond the one-time global-dilution step, disjoint tenants must add
    // candidates linearly: each new tenant brings its own queries matching
    // only its own gated vocabulary
    assert(c4 <= slack * 2 * c2,
      s"q120: x2→x4 candidates grew ${c4.toDouble / c2}x at 2x tenants — " +
        "per-tenant candidate rate is not constant (tenant gate regression?)")
  }

  test("q88/q129 PassJoin probe keys stay under (k+1)²(2k+1) per string") {
    // the operator's claimed asymptote (NearDup.editDistancePairs scaladoc:
    // "O(k³) probe keys per string, independent of corpus size") as a
    // deterministic count: for k = 2 every name emits at most
    // (k+1)²(2k+1) = 45 probe keys, so the TOTAL is ≤ 45·|names| at any
    // scale — a lost boundary filter (the `p.st >= 0 AND p.st+p.ln <= l`
    // guard) or a fan-out regression breaks this on any host.
    val perString = 3 * 3 * 5 // (k+1)² · (2k+1), k = 2
    for ((dir, label) <- Seq(base -> "base", x4 -> "x4")) {
      val n = spark.read.parquet(s"$dir/part.parquet")
        .select("p_name").distinct().count()
      val keys = QueriesExt.q88ProbeKeys(spark, dir).count()
      info(s"q88_probe[$label]: names=$n keys=$keys budget=${perString * n}")
      assert(keys > 0, s"q88[$label]: empty probe-key set — vacuous budget")
      assert(keys <= perString * n,
        s"q88[$label]: $keys probe keys exceed ${perString * n} = " +
          s"$perString × $n names — per-string fan-out regression")
    }
  }

  test("q88/q129 PassJoin candidates stay in the aligned-chunk collision band") {
    // ScaleUp's part names: copy 0 verbatim, copies j ≥ 1 get a 3-char
    // "-jjj" suffix. Candidate structure on that corpus is analytic:
    //  - within each copy the base candidate set replicates (k·c1);
    //  - copy-0 names CANNOT collide with suffixed copies (length gap
    //    4 > k = 2 is outside the probe's partner-length range);
    //  - suffixed copies j ≠ j' pairwise share aligned prefix chunks
    //    (same length, same prefix), so every name yields its
    //    C(k−1, 2) cross-copy self-candidates, and base candidate pairs
    //    of EQUAL length can additionally collide across copy pairs —
    //    bounded by C(k−1, 2)·(n + c1).
    // All candidates beyond k·c1 are verify-rejected (cross-copy distance
    // is exactly 3 by construction — ScaleUpSpec pins it), which is the
    // blocking-then-verify contract, not a leak; what this budget catches
    // is a DEGENERATE blocking key (lost chunk alignment → n²/2 pairs:
    // 319k at x4 vs the ~4k this band allows).
    val k = 4
    val c1 = QueriesExt.q88Candidates(spark, base).count()
    val n1 = spark.read.parquet(s"$base/part.parquet")
      .select("p_name").distinct().count()
    val ck = QueriesExt.q88Candidates(spark, scaleTo(k)).count()
    val cross = (k - 1).toLong * (k - 2) / 2
    val budget = (slack * (k * c1 + cross * (n1 + c1))).toLong
    info(s"q88_cand: base=$c1 names=$n1 x$k=$ck budget=$budget")
    assert(c1 > 0, "q88: empty base candidate set — vacuous budget")
    assert(ck >= c1, s"q88: scaled candidates $ck < base $c1 — the " +
      "scaled corpus lost the verbatim copy's structure")
    assert(ck <= budget,
      s"q88: candidates grew to $ck at ${k}x data — over the " +
        s"aligned-chunk collision budget $budget (blocking key degraded?)")
  }

  test("q120 two-level gate cuts the ungated posting volume by ≥ 4x") {
    val gated = QueriesExt.q120Candidates(spark, x4).count()
    val ungated = QueriesExt.q120CandidatesUngated(spark, x4).count()
    info(s"q120_gate: gated=$gated ungated=$ungated (${ungated / math.max(gated, 1)}x cut)")
    assert(gated * 4 <= ungated,
      s"q120: the df gates keep $gated of $ungated posting matches — " +
        "the tenant-stopword flood is not being pruned")
  }
}
