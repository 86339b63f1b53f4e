package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `sample()`/`TABLESAMPLE` draw from a seeded RNG whose result depends on
  * partitioning — rerun the job with different splits and the sample
  * changes. Curation pipelines need the opposite: membership decided by a
  * pure function of the ROW, so samples are reproducible across runs,
  * engines, and repartitioning, and a document's fate never flips between
  * pipeline versions. The gate is a stable md5-derived hash of the id
  * column — a pure map, no shuffle, fuses into the scan's codegen stage.
  */
object Sampling {

  /** True iff the row's stable hash lands under `pct` (percent, 0-100).
    * Hash = first 8 md5 hex chars of the id's string form, mod 100 —
    * engine-portable (any system that can md5 a string agrees). */
  def hashGate(id: Column, pct: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(100)) < pct

  /** Stratified deterministic sample: per-stratum percentage with a
    * default — e.g. keep 50% of English documents, 10% of the rest.
    * Selectivity is exact in expectation per stratum and the decision per
    * row is permanent (stable hash), which is what data-mix rebalancing
    * at 100 TB needs: adjusting a rate only adds/removes the hash band
    * edge, never reshuffles membership inside the retained band. */
  def stratifiedHash(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = rates.toSeq.sortBy(_._1).foldRight(lit(defaultPct): Column) {
      case ((stratum, p), els) => when(col(strataCol) === stratum, lit(p)).otherwise(els)
    }
    df.filter(hashGate(col(idCol), pct))
  }

  /** Per-key frequency cap: keep at most `n` rows per `keyCol`, chosen by
    * the STABLE md5 order of (key, id) — the anti-over-representation gate
    * of corpus curation (cap documents per domain/source). Membership is a
    * pure function of the two columns: rerun, repartition, or rescale and
    * the same rows survive. One window shuffle partitioned by key; the cap
    * is a bounded per-key heap (WindowGroupLimit pushes the filter below
    * the exchange), so work per key never exceeds n at any corpus size.
    * Appends `rn` (1-based stable rank within the key). */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"cap must be >= 1, got $n")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(md5(concat_ws(":", col(keyCol), col(idCol))), col(idCol))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Basis-point (1/10000) hash gate — [[hashGate]] at the resolution
    * mixture targets need. */
  def hashGateBp(id: Column, bp: Column): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(10000)) < bp

  /** Deterministic mixture re-weighting: sample the LARGEST subset whose
    * strata follow `targetBp` (basis points per stratum, e.g. web 7000 /
    * code 2000 / papers 1000) — the static domain-mixture step of
    * training-data curation.
    *
    * The derivation is pure integer arithmetic, so the sample is exact and
    * engine-portable: with per-stratum counts c_s, the feasible total is
    * T = min_s ⌊c_s·10000/bp_s⌋ (the binding stratum is kept whole-ish),
    * each stratum keeps rate_s = ⌊T·bp_s/c_s⌋ basis points of its rows via
    * the stable hash gate, and rows of unlisted strata are dropped. One
    * tiny count aggregate (|strata| rows to the driver — a model, not a
    * data collect) then a pure-map gate: no shuffle of the data itself,
    * identical membership under any partitioning, and adjusting targets
    * only moves hash-band edges — [[stratifiedHash]]'s stability contract.
    */
  def toMixture(df: DataFrame, idCol: String, strataCol: String,
      targetBp: Map[String, Int]): DataFrame = {
    require(targetBp.nonEmpty && targetBp.values.forall(_ > 0),
      "targetBp must be positive basis points per stratum")
    require(targetBp.values.sum <= 10000,
      s"target basis points sum to ${targetBp.values.sum} > 10000")
    val strata = targetBp.keys.toSeq.sorted
    val counts: Map[String, Long] = df
      .filter(col(strataCol).isin(strata.map(lit): _*))
      .groupBy(col(strataCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strata.foreach { s =>
      require(counts.getOrElse(s, 0L) > 0, s"stratum '$s' has no rows")
      require(counts(s) <= Long.MaxValue / 10000,
        s"stratum '$s' count overflows the bp arithmetic")
    }
    val total = strata.map(s => Math.floorDiv(counts(s) * 10000L, targetBp(s).toLong)).min
    val rates = strata.map(s => s -> Math.floorDiv(total * targetBp(s), counts(s))).toMap
    // a floored rate of 0 means the imbalance exceeds the gate's 1/10000
    // resolution (stratum should keep < c/10000 rows): fail loudly —
    // silently dropping the stratum would ship the WRONG mixture, and
    // clamping to 1 bp would overshoot its share by orders of magnitude
    rates.find(_._2 == 0L).foreach { case (s, _) =>
      throw new IllegalArgumentException(
        s"toMixture: stratum '$s' needs a keep rate below 1/10000 " +
          s"(counts $counts, targets $targetBp) — the mixture is too " +
          "imbalanced for the basis-point gate; pre-sample the dominant " +
          "strata or adjust targets")
    }
    val rateBp: Column = strata.foldRight(lit(-1L): Column) { (s, els) =>
      when(col(strataCol) === s, lit(rates(s))).otherwise(els)
    }
    df.filter(hashGateBp(col(idCol), rateBp))
  }

  /** Deterministic weighted sample of k rows, inclusion odds ∝ weight —
    * the priority-sampling scheme (Efraimidis-Spirakis shape) made
    * engine-portable: each row gets the rational priority h/w with h its
    * stable md5 hash, and the k SMALLEST priorities win. Heavier rows get
    * proportionally smaller priorities, a row's fate is a pure function of
    * (id, weight), and the whole thing is integer arithmetic
    * (`h·10⁶ DIV w`, ties on id), so any engine draws the identical
    * sample. Spark plans the k-smallest as TakeOrdered — per-partition
    * heaps of k, no global sort.
    *
    * Rows with non-positive or null weight are DROPPED (same contract as
    * [[weightedTopKPerKey]]): a sample padded with unweightable rows would
    * violate the odds-∝-weight contract the moment k exceeds the weighted
    * population.
    *
    * @param df        input
    * @param idCol     identity column (hash source + tiebreak)
    * @param weightCol positive integral weights ≤ ~9·10¹² (h·10⁶ must fit)
    * @param k         sample size
    * @return sampled rows + `priority` */
  def weightedTopK(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"weightedTopK needs k >= 1, got $k")
    df.filter(col(weightCol) > 0)
      .withColumn("priority", priority(idCol, weightCol))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** [[weightedTopK]] within each stratum: k winners per `keyCol`, same
    * integer rational priorities, one window shuffle partitioned by key —
    * the per-key filter is a bounded heap (WindowGroupLimit pushes it
    * below the exchange, the [[capPerKey]] shape), so work per stratum
    * never exceeds k at any corpus size. Rows with non-positive weight are
    * dropped: a per-stratum sample that padded with unweightable rows
    * would misrepresent sparse strata. */
  def weightedTopKPerKey(df: DataFrame, keyCol: String, idCol: String,
      weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"weightedTopKPerKey needs k >= 1, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(keyCol))
      .orderBy(col("priority"), col(idCol))
    df.filter(col(weightCol) > 0)
      .withColumn("priority", priority(idCol, weightCol))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .drop("rn")
  }

  /** Rational sampling priority h·10⁶ DIV w (smaller wins, odds ∝ w). */
  private def priority(idCol: String, weightCol: String): Column =
    expr("1000000 * " +
      s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 8), 16, 10) AS BIGINT)" +
      s" DIV (CASE WHEN $weightCol > 0 THEN $weightCol END)")
}
