package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution profiling with EXACT integer arithmetic — the q55/q69/q81
  * rational-score discipline applied to second moments, so an independent
  * engine reproduces every flag bit-for-bit (floating mean/stddev
  * comparisons diverge across engines because float addition is not
  * associative; integer moments cannot).
  *
  * Encoding contract (SURVEY §2.13): the DECIMAL(38,0) rationals these
  * operators return are for INTERNAL exact arithmetic and composition.
  * Final projections that ship to the correctness gate must render them
  * as strings — decimal128 does not hash portably across engines.
  */
object Stats {

  /** z-sigma outlier flags per group, computed WITHOUT division or sqrt:
    *
    *   |x − μ| > z·σ  ⇔  (10·(n·x − S1))² > z10² · (n·S2 − S1²)
    *
    * with S1 = Σx, S2 = Σx² (population variance form, n·σ² scaled by n²)
    * and z = z10/10 — every term an exact DECIMAL(38,0) integer.
    *
    * Magnitude budget (documented, not checked row-by-row): every term
    * must stay under 10³⁸, and the binding one is (10·(n·x − S1))², so
    * keep n·|x|_max ≤ 10¹⁸ — e.g. cents up to 10⁶ with group sizes up to
    * 10¹² (comfortably past 100 TB). Past the budget a decimal overflow
    * nulls the predicate, and under the repo session's ANSI-off setting
    * (core/Sessions.scala) a null predicate silently DROPS the row — a
    * false negative, never a false positive. Callers whose inputs can
    * approach the budget pass `assertBudget = true` (one extra cheap
    * aggregate that fails loudly when n·|x|_max exceeds 10¹⁸) or run with
    * spark.sql.ansi.enabled=true to surface the overflow instead.
    *
    * Scale shape: ONE map-side-combinable aggregate over the input builds
    * the per-group moments (|groups| rows), a broadcast-eligible join
    * carries them back, and the flag itself is a pure row-local predicate —
    * a single shuffle end-to-end.
    *
    * @param df      input; `valCol` must be integral (cents-style)
    * @param keyCols grouping columns
    * @param valCol  long-typed measure
    * @param z10     threshold in tenths of a sigma (30 ⇒ 3.0σ)
    * @return input rows where the deviation exceeds (z10/10)·σ, with the
    *         group's `n` attached */
  def sigmaOutliers(df: DataFrame, keyCols: Seq[String], valCol: String,
      z10: Int, assertBudget: Boolean = false): DataFrame = {
    require(z10 > 0, s"sigmaOutliers needs z10 > 0, got $z10")
    if (assertBudget) {
      // One map-side-combinable aggregate over (max n, max |x|): the
      // binding magnitude term is (10·(n·x − S1))² < 10³⁸ ⟸ n·|x|_max ≤ 10¹⁸.
      val row = df.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("gf_bn"), max(abs(col(valCol))).as("gf_bx"))
        .agg(max(col("gf_bn").cast("decimal(38,0)")
          * col("gf_bx").cast("decimal(38,0)")).as("gf_budget"))
        .head()
      val budget = Option(row.getDecimal(0)).map(_.toBigInteger)
      require(budget.forall(_.compareTo(java.math.BigInteger.TEN.pow(18)) <= 0),
        s"sigmaOutliers magnitude budget exceeded: max group n*|x| = " +
          s"${budget.orNull} > 1e18 — DECIMAL(38,0) would overflow and " +
          "(ANSI off) silently drop rows; rescale valCol or split groups")
    }
    val d38 = "decimal(38,0)"
    val x = col(valCol).cast(d38)
    val moments = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast(d38).as("gf_n"),
        sum(x).as("gf_s1"),
        sum((x * x).cast(d38)).as("gf_s2"))
    df.join(moments, keyCols)
      .filter {
        val dev = (col("gf_n") * x - col("gf_s1")) * lit(10).cast(d38)
        val nVar = col("gf_n") * col("gf_s2") - col("gf_s1") * col("gf_s1")
        (dev * dev).cast(d38) > (lit(z10.toLong * z10).cast(d38) * nVar).cast(d38)
      }
      .select(df.columns.toIndexedSeq.map(col) :+ col("gf_n").cast("long").as("n"): _*)
  }

  /** Median-absolute-deviation outlier flags per group — the ROBUST
    * companion to [[sigmaOutliers]]: a single extreme value drags a mean
    * and explodes a variance (masking its own z-score), but moves a
    * median by at most one rank, so MAD flags survive the contaminated
    * distributions that curation actually meets.
    *
    *   flag ⇔ |x − median(x)| > k · median(|x − median(x)|)
    *
    * Exactness without rationals: the p·(n−1)-interpolated median of
    * integers is a HALF-integer, each deviation |x − med| a half-integer,
    * the MAD of those a QUARTER-integer — dyadic rationals far inside
    * double's 2⁵³ exact range — and `k` is an integer, so every IEEE
    * engine computes the predicate bit-identically (the q54 percentile
    * cross-check discipline; no epsilon anywhere).
    *
    * Scale shape: TWO aggregate passes — inherent, the deviations need
    * the median first — each producing a |groups|-row model joined back
    * broadcast; the flag is a row-local predicate. `percentile` holds
    * full per-group value state (the exact path); when groups outgrow
    * executor memory, [[binnedQuantilesPerKey]] is the fixed-memory
    * estimate to compose instead.
    *
    * @param df      input; `valCol` must be integral (cents-style)
    * @param keyCols grouping columns
    * @param valCol  long-typed measure
    * @param k       threshold multiplier on the MAD
    * @return input rows whose deviation exceeds k·MAD, with the group's
    *         `med` and `mad` attached (exact dyadic doubles) */
  def madOutliers(df: DataFrame, keyCols: Seq[String], valCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"madOutliers needs k > 0, got $k")
    val keys = keyCols.map(col)
    val med = df.groupBy(keys: _*)
      .agg(expr(s"percentile($valCol, 0.5)").as("med"))
    val dev = df.join(broadcast(med), keyCols)
      .withColumn("gf_dev", abs(col(valCol) - col("med")))
    val mad = dev.groupBy(keys: _*)
      .agg(expr("percentile(gf_dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), keyCols)
      .filter(col("gf_dev") > lit(k) * col("mad"))
      .select(df.columns.toIndexedSeq.map(col)
        :+ col("med") :+ col("mad"): _*)
  }

  /** Per-group least-squares trend WITHOUT floating division: the slope of
    * y over x is `slope_num / slope_den` with
    *
    *   slope_num = n·Σxy − Σx·Σy      slope_den = n·Σx² − (Σx)²
    *
    * both returned as exact DECIMAL(38,0) integers (the caller divides —
    * or compares trends by cross-multiplying, staying exact). One
    * map-side-combinable aggregate, |groups| output rows. The sign of
    * slope_num alone answers "is this series rising?" — no epsilon, no
    * engine drift. Magnitude budget: n·|x·y|_max < 10³⁸.
    *
    * @param df      input; xCol and yCol must be integral
    * @return keyCols + (n, slope_num, slope_den) */
  def trendExact(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val x = col(xCol).cast(d38)
    val y = col(yCol).cast(d38)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * y).cast(d38)).as("sxy"),
        sum((x * x).cast(d38)).as("sxx"))
      .select(keyCols.map(col) ++ Seq(
        col("n").cast("long").as("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).cast(d38).as("slope_num"),
        (col("n") * col("sxx") - col("sx") * col("sx")).cast(d38).as("slope_den")): _*)
  }

  /** χ²-style contingency profiling between two categorical columns with
    * EXACT integer cell statistics: for each (a, b) cell the observed
    * count `o`, margins `r`/`c`, grand total `n`, and the χ² contribution
    * as the exact rational pair
    *
    *   chi_num = (n·o − r·c)²        chi_den = n·r·c
    *
    * (cell contribution = chi_num / chi_den / n in the usual scaling; the
    * caller sums ratios — or compares association strength by
    * cross-multiplying, staying integer-exact).
    *
    * Scale shape: one hash aggregate to cells (bounded by the category
    * product, never rows), margins as two |cells|-sized re-aggregations
    * joined back, the grand total a 1-row broadcast scalar (the q55
    * model-broadcast pattern). */
  def chiSquareCells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("o")).localCheckpoint()
    val rm = cells.groupBy(col(aCol)).agg(sum(col("o")).as("r"))
    val cm = cells.groupBy(col(bCol)).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"))
    val dev = (col("n").cast(d38) * col("o").cast(d38)
      - col("r").cast(d38) * col("c").cast(d38)).cast(d38)
    cells.join(rm, aCol).join(cm, bCol).crossJoin(broadcast(n))
      .select(col(aCol), col(bCol), col("o"), col("r"), col("c"), col("n"),
        (dev * dev).cast(d38).as("chi_num"),
        (col("n").cast(d38) * col("r").cast(d38) * col("c").cast(d38))
          .cast(d38).as("chi_den"))
  }

  /** Exact Pearson correlation as integer rationals — [[trendExact]]'s
    * discipline extended with the y second moment:
    *
    *   corr = corr_num / √(corr_den_x · corr_den_y)
    *
    * with corr_num = n·Σxy − Σx·Σy, corr_den_x = n·Σx² − (Σx)²,
    * corr_den_y = n·Σy² − (Σy)². The three DECIMAL(38,0) integers carry
    * the full information (consumers compare corr² via cross-
    * multiplication or take one sqrt at the very end), so an independent
    * engine reproduces every row bit-for-bit. ONE map-side-combinable
    * aggregate; keep n·max(Σx², Σy²) under 10³⁸.
    *
    * @param df      input; xCol/yCol must be integral (cents-style)
    * @return keyCols + (n, corr_num, corr_den_x, corr_den_y) */
  def correlationExact(df: DataFrame, keyCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val x = col(xCol).cast(d38)
    val y = col(yCol).cast(d38)
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).cast(d38).as("nn"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum((x * y).cast(d38)).as("sxy"),
        sum((x * x).cast(d38)).as("sxx"),
        sum((y * y).cast(d38)).as("syy"))
      .select(keyCols.map(col) ++ Seq(
        col("nn").cast("long").as("n"),
        (col("nn") * col("sxy") - col("sx") * col("sy")).cast(d38).as("corr_num"),
        (col("nn") * col("sxx") - col("sx") * col("sx")).cast(d38).as("corr_den_x"),
        (col("nn") * col("syy") - col("sy") * col("sy")).cast(d38).as("corr_den_y")): _*)
  }

  /** Cohen's κ inter-rater agreement as EXACT integer rationals — the
    * labeling-function diagnostics step of weak supervision: how much do
    * two annotators (or two heuristic raters) agree beyond chance?
    *
    *   κ = (p_o − p_e) / (1 − p_e)
    *     = (n·agree − Σ_ℓ r_ℓ·c_ℓ) / (n² − Σ_ℓ r_ℓ·c_ℓ)
    *
    * with agree = matching pairs, r_ℓ/c_ℓ the per-label margins of each
    * rater. Numerator and denominator ship as DECIMAL(38,0) integers (n²
    * overflows int64 past ~3·10⁹ rows per group — real at corpus scale);
    * the caller compares κ values by cross-multiplying or renders as
    * strings per the SURVEY §2.13 contract.
    *
    * Scale shape ([[chiSquareCells]]'s): ONE hash aggregate to the
    * (key, a, b) cell table — bounded by key × label², never rows — then
    * margins, agreement, and the chance term are |cells|-sized
    * re-aggregations of it.
    *
    * @return keyCols + (n, agree, kappa_num, kappa_den) */
  def cohenKappa(df: DataFrame, keyCols: Seq[String], aCol: String,
      bCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val k = keyCols.map(col)
    val cells = df.groupBy(k :+ col(aCol).as("__a") :+ col(bCol).as("__b"): _*)
      .agg(count(lit(1)).as("o")).localCheckpoint()
    val nn = cells.groupBy(k: _*)
      .agg(sum(col("o")).cast(d38).as("n"),
        sum(when(col("__a") === col("__b"), col("o")).otherwise(0L))
          .cast(d38).as("agree"))
    val rm = cells.groupBy(k :+ col("__a").as("__lab"): _*)
      .agg(sum(col("o")).cast(d38).as("r"))
    val cm = cells.groupBy(k :+ col("__b").as("__lab"): _*)
      .agg(sum(col("o")).cast(d38).as("c"))
    // chance agreement: labels present for only one rater contribute 0,
    // which the inner join encodes
    val pe = rm.join(cm, keyCols :+ "__lab")
      .groupBy(k: _*)
      .agg(sum((col("r") * col("c")).cast(d38)).cast(d38).as("rc"))
    nn.join(pe, keyCols, "left")
      .select(k ++ Seq(
        col("n").cast("long").as("n"),
        col("agree").cast("long").as("agree"),
        (col("n") * col("agree") - coalesce(col("rc"), lit(0).cast(d38)))
          .cast(d38).as("kappa_num"),
        (col("n") * col("n") - coalesce(col("rc"), lit(0).cast(d38)))
          .cast(d38).as("kappa_den")): _*)
  }

  /** One-pass binned quantile estimation — the 100 TB scale path next to
    * exact percentiles: an exact quantile needs a global sort (or a full
    * `percentile` state), while a fixed histogram is ONE map-side-combined
    * aggregate into at most `nBins` cells plus bounded driver-free
    * arithmetic on the cell table. The answer is an interval [bin_lo,
    * bin_hi] guaranteed to contain the true quantile (width = value range /
    * nBins), which is what a training-data filter actually consumes
    * ("p99 doc length" as a threshold).
    *
    * All arithmetic is integer (DIV), so an independent engine reproduces
    * every row bit-for-bit. Bounds come from a 1-row min/max broadcast (the
    * q55 scalar pattern) — two passes total over the input, both full-scan
    * aggregates with no shuffle beyond nBins+1 rows.
    *
    * @param df         input; `valCol` must be integral (cents-style)
    * @param valCol     long-typed measure
    * @param nBins      histogram resolution
    * @param qsPermille quantiles in permille (500 = median, 999 = p99.9)
    * @return (q_permille, bin, bin_lo, bin_hi, cum_rows, n_total), one row
    *         per requested quantile: the first bin whose cumulative count
    *         reaches q‰ of the total, with its exact value interval */
  def binnedQuantiles(df: DataFrame, valCol: String, nBins: Int,
      qsPermille: Seq[Int]): DataFrame = {
    require(nBins >= 2, s"binnedQuantiles needs nBins >= 2, got $nBins")
    require(qsPermille.nonEmpty && qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be in 1..1000 permille, got $qsPermille")
    // percentile semantics ignore nulls — keeping them would inflate every
    // cumulative count (and diverge from any SQL mirror's null ordering)
    val vals = df.filter(col(valCol).isNotNull)
    val bounds = vals.agg(min(col(valCol)).cast("long").as("lo"),
      max(col(valCol)).cast("long").as("hi"))
    // bin = (v - lo)·nBins DIV (hi - lo + 1) — always in [0, nBins); the
    // product runs in DECIMAL(38,0) because (v-lo)·nBins exceeds int64
    // once the value range passes 2^63/nBins, and non-ANSI int64 wraps
    // silently into negative bins
    val counts = vals.crossJoin(broadcast(bounds))
      .select(expr(s"CAST((CAST($valCol - lo AS DECIMAL(38,0)) * $nBins)" +
        " DIV (hi - lo + 1) AS INT)").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
    // ≤ nBins rows from here on: the single-partition window is bounded
    val cum = counts
      .withColumn("cum", sum(col("n")).over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ntot", sum(col("n")).over(Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qs = df.sparkSession.range(1)
      .select(explode(array(qsPermille.map(lit(_)): _*)).as("q_permille"))
    qs.join(broadcast(cum),
        col("cum") * 1000 >= col("q_permille").cast("long") * col("ntot"))
      .groupBy("q_permille")
      .agg(min(col("bin")).as("bin"),
        min_by(col("cum"), col("bin")).as("cum_rows"),
        min(col("ntot")).as("n_total"))
      .crossJoin(broadcast(bounds))
      // edge math shares the DECIMAL(38,0) discipline: bin·(hi−lo+1) hits
      // the same int64 ceiling as the binning product
      .select(col("q_permille"), col("bin"),
        expr("CAST(lo + (CAST(bin AS DECIMAL(38,0)) * (hi - lo + 1)" +
          s" + $nBins - 1) DIV $nBins AS BIGINT)").as("bin_lo"),
        expr("CAST(lo + (CAST(bin + 1 AS DECIMAL(38,0)) * (hi - lo + 1)" +
          s" + $nBins - 1) DIV $nBins - 1 AS BIGINT)").as("bin_hi"),
        col("cum_rows"), col("n_total"))
  }

  /** Per-key [[binnedQuantiles]] — the q96→q109 move applied to
    * quantiles: one fixed histogram PER GROUP, ≤ nBins+1 rows of state
    * per key, where an exact per-group percentile would sort (or hold the
    * full value multiset of) every group. Per-key bounds come from one
    * |keys|-sized aggregate joined back (broadcast-eligible); the binning
    * product and edge math run in DECIMAL(38,0) for the same int64-wrap
    * reasons as the global form; the cumulative window partitions by key,
    * so no single-partition stage exists at any key count.
    *
    * @return (keyCol, q_permille, bin, bin_lo, bin_hi, cum_rows, n_total),
    *         one row per key × requested quantile */
  def binnedQuantilesPerKey(df: DataFrame, keyCol: String, valCol: String,
      nBins: Int, qsPermille: Seq[Int]): DataFrame = {
    require(nBins >= 2, s"binnedQuantilesPerKey needs nBins >= 2, got $nBins")
    require(qsPermille.nonEmpty && qsPermille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be in 1..1000 permille, got $qsPermille")
    val vals = df.filter(col(valCol).isNotNull)
    val bounds = vals.groupBy(col(keyCol))
      .agg(min(col(valCol)).cast("long").as("lo"),
        max(col(valCol)).cast("long").as("hi"))
    val counts = vals.join(bounds, keyCol)
      .select(col(keyCol), expr(
        s"CAST((CAST($valCol - lo AS DECIMAL(38,0)) * $nBins)" +
          " DIV (hi - lo + 1) AS INT)").as("bin"))
      .groupBy(col(keyCol), col("bin")).agg(count(lit(1)).as("n"))
    val byKey = Window.partitionBy(col(keyCol)).orderBy("bin")
    val cum = counts
      .withColumn("cum", sum(col("n")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("ntot", sum(col("n")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val qs = df.sparkSession.range(1)
      .select(explode(array(qsPermille.map(lit(_)): _*)).as("q_permille"))
    cum.crossJoin(broadcast(qs))
      .filter(col("cum") * 1000 >= col("q_permille").cast("long") * col("ntot"))
      .groupBy(col(keyCol), col("q_permille"))
      .agg(min(col("bin")).as("bin"),
        min_by(col("cum"), col("bin")).as("cum_rows"),
        min(col("ntot")).as("n_total"))
      .join(bounds, keyCol)
      .select(col(keyCol), col("q_permille"), col("bin"),
        expr("CAST(lo + (CAST(bin AS DECIMAL(38,0)) * (hi - lo + 1)" +
          s" + $nBins - 1) DIV $nBins AS BIGINT)").as("bin_lo"),
        expr("CAST(lo + (CAST(bin + 1 AS DECIMAL(38,0)) * (hi - lo + 1)" +
          s" + $nBins - 1) DIV $nBins - 1 AS BIGINT)").as("bin_hi"),
        col("cum_rows"), col("n_total"))
  }

  /** Time-weighted average per key over an irregularly-sampled series:
    * each observation holds until the key's next one, so the mean is
    * Σ(vᵢ·Δtᵢ)/ΣΔtᵢ — the correct summary where the row-mean would
    * over-weight bursts of closely-spaced samples. The key's LAST
    * observation has no holding interval and contributes nothing.
    *
    * Exactness: value·µs products and the µs total are summed in
    * DECIMAL(38,0) (a year-long span at 10⁶-unit values overflows
    * BIGINT), and the quotient is DECIMAL DIV — truncating integral
    * division, ≡ DuckDB HUGEINT floor division on non-negative
    * operands — rendered in micro-units of `valCol`.
    *
    * Scale shape: one lead window per key then one aggregate on the
    * SAME key partitioning — a single exchange end-to-end.
    *
    * Degenerate keys: if EVERY observation of a key shares one
    * timestamp, total holding time is 0 and the ANSI-off DECIMAL DIV
    * yields a null `twap_micro` (a SQL engine with checked division
    * would throw instead). Callers that must be engine-portable filter
    * `twap_micro IS NOT NULL` — see q146.
    *
    * @param df      input rows
    * @param keyCols grouping columns
    * @param usCol   epoch-microsecond long observation time
    * @param seqCol  unique tie-break column for equal timestamps
    * @param valCol  long-typed integral measure (cents-style)
    * @return one row per key: keys..., `twap_micro` (10⁻⁶ units of
    *         valCol; null when the key's holding time is 0),
    *         `n_intervals` */
  def timeWeightedAvg(df: DataFrame, keyCols: Seq[String], usCol: String,
      seqCol: String, valCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(usCol), col(seqCol))
    df.withColumn("gf_nxt", lead(col(usCol), 1).over(w))
      .filter(col("gf_nxt").isNotNull)
      .withColumn("gf_dt", col("gf_nxt") - col(usCol))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col(valCol).cast("decimal(38,0)") * col("gf_dt"))
          .cast("decimal(38,0)").as("gf_num"),
        sum(col("gf_dt").cast("decimal(38,0)")).cast("decimal(38,0)").as("gf_den"),
        count(lit(1)).as("n_intervals"))
      .select(keyCols.map(col) :+
        expr("CAST((gf_num * 1000000) DIV gf_den AS BIGINT)").as("twap_micro") :+
        col("n_intervals"): _*)
  }

  /** Gini coefficient per key in exact integer arithmetic: with values
    * ranked ascending (i = row_number, tie-broken by `seqCol` — ties
    * cannot move the result: equal x contribute the same Σi·xᵢ under any
    * rank assignment), G = (2·Σi·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ), rendered in
    * micro-units via DECIMAL(38,0) DIV (Σi·xᵢ reaches n²·x_max — far
    * past BIGINT at warehouse row counts). Values must be non-negative
    * (Gini is undefined below zero); an all-zero group divides by zero
    * and yields a null `gini_micro` under ANSI-off.
    *
    * Scale shape: one per-key ranked window feeding a per-key aggregate
    * on the SAME partitioning — a single exchange end-to-end.
    *
    * @param df      input rows
    * @param keyCols grouping columns
    * @param valCol  long-typed non-negative measure (cents-style)
    * @param seqCol  unique tie-break column for equal values
    * @return one row per key: keys..., `n`, `gini_micro` ∈ [0, 10⁶) */
  def giniByKey(df: DataFrame, keyCols: Seq[String], valCol: String,
      seqCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val wn = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(valCol), col(seqCol))
    df.withColumn("gf_i", row_number().over(wn))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast(d38)).cast(d38).as("gf_sx"),
        sum(col("gf_i").cast(d38) * col(valCol)).cast(d38).as("gf_six"))
      .select(keyCols.map(col) :+ col("n") :+
        expr("CAST((2 * gf_six - (n + 1) * gf_sx) * 1000000 " +
          "DIV (CAST(n AS DECIMAL(38,0)) * gf_sx) AS BIGINT)").as("gini_micro"): _*)
  }
}
