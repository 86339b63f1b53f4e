package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.array
import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}

/** Physical-layout keys as column functions — the query-side surface of
  * [[graft.sources.Sinks.writeZOrdered]]'s layout (computing the same key
  * in a query enables manual cell assignment, layout audits, and the
  * oracle check in q77). */
object Layout {
  /** Morton (Z-order) interleave of non-negative integer dimensions —
    * [[graft.plans.ZOrderExpr]]. Inputs are masked to `bitsPerDim` low
    * bits; range-validate upstream (as `writeZOrdered` does) when aliasing
    * would matter. */
  def zorder(bitsPerDim: Int, dims: Column*): Column =
    toCol(graft.plans.ZOrderExpr(
      toExpr(array(dims: _*)), bitsPerDim, dims.size))
}
