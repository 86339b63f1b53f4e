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
}
