package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution profiling with EXACT integer arithmetic — the q55/q69/q81
  * rational-score discipline applied to second moments, so an independent
  * engine reproduces every flag bit-for-bit (floating mean/stddev
  * comparisons diverge across engines because float addition is not
  * associative; integer moments cannot).
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
    * 10¹² (comfortably past 100 TB). Overflow surfaces as null/ANSI
    * error, never a silent wrong flag.
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
      z10: Int): DataFrame = {
    require(z10 > 0, s"sigmaOutliers needs z10 > 0, got $z10")
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
}
