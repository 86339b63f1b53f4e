package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bulk-iterative graph analytics on DataFrames.
  *
  * PageRank here is the non-normalized integer variant: ranks live in
  * micro-units (1.0 → 1,000,000) and every step is integral —
  * `next = 150000 + (850 · Σ incoming (rank div outdeg)) div 1000`,
  * i.e. damping 0.85 in exact rational form. Floating-point PageRank
  * diverges across engines/partitionings because float addition is not
  * associative; integral arithmetic makes the result a pure function of
  * the graph, so an independent engine (the DuckDB oracle, q81) can
  * reproduce it bit-for-bit — the q55/q69 rational-score discipline
  * applied to graph iteration.
  *
  * Scale shape: edges are deduped and degree-annotated ONCE and cached;
  * each iteration is one equi-join (edges ⋈ ranks on src) plus one
  * aggregation (sum by dst) — the canonical distributed PageRank. Ranks
  * are lineage-truncated per round (`localCheckpoint`): an iterative
  * fixpoint that re-plans its whole history doubles the plan each round
  * and eventually OOMs the planner (the NearDup.clusters lesson).
  *
  * Nodes with no outgoing edge contribute nothing (standard simplified
  * dangling handling); nodes with no incoming edge keep the base mass
  * `150000 + 0`. Symmetrize edges upstream when the random surfer should
  * walk both ways (q81 does).
  */
object Graph {

  /** @param edges two columns `src`, `dst` (any duplicate edges are
    *              collapsed — multi-edges would double-count mass)
    * @return `node`, `rank_micro` for every node incident to an edge */
  def pageRank(edges: DataFrame, iters: Int, initMicro: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"pageRank needs >= 1 iteration, got $iters")
    // materialize the deduped edge list ONCE: deg, annotated, and nodes all
    // branch from it, and without truncation every branch re-runs the whole
    // upstream edge derivation (at sf0.1 that re-ran a lineitem-join scan
    // per iteration — 9 s instead of ~2)
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val annotated = e.join(deg, "src").cache()
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()

    var rank = nodes.withColumn("rank_micro", lit(initMicro)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = annotated
        .join(rank, annotated("src") === rank("node"))
        .selectExpr("dst AS node", "rank_micro div outdeg AS c")
      val stepped = contrib
        .groupBy("node")
        .agg(expr("150000 + (850 * sum(c)) div 1000").as("rank_micro"))
      // no-incoming-edge nodes keep base mass; in a symmetrized graph
      // this join is a no-op but the operator must not drop nodes
      rank = nodes
        .join(stepped, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("rank_micro"), lit(150000L)).as("rank_micro"))
        .localCheckpoint()
    }
    annotated.unpersist()
    rank
  }
}
