package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of d non-negative dimensions, `bitsPerDim`
  * bits each, into one sort key: output bit `i·d + j` is bit `i` of
  * dimension `j`. Sorting by this key clusters rows that are close in ALL
  * dimensions at once, so parquet min/max footer stats stay tight per file
  * in every dimension — multi-dimensional data skipping from a
  * one-dimensional sort (the layout trick behind Delta/Iceberg OPTIMIZE
  * ZORDER). One codegen'd loop; inputs are masked to their low
  * `bitsPerDim` bits (callers range-encode first — a value at or beyond
  * 2^bits would alias, so [[graft.sources.Sinks.writeZOrdered]] validates
  * ranges up front). */
case class ZOrderExpr(child: Expression, bitsPerDim: Int, nDims: Int)
    extends UnaryExpression with Serializable {
  require(nDims >= 2 && bitsPerDim >= 1 && nDims * bitsPerDim <= 63,
    s"z-order needs 2+ dims and nDims*bitsPerDim <= 63, got $nDims x $bitsPerDim")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)

  override protected def nullSafeEval(v: Any): Any =
    ZOrderExpr.compute(v.asInstanceOf[ArrayData], bitsPerDim, nDims)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.ZOrderExpr.compute($v, $bitsPerDim, $nDims)")
  override protected def withNewChildInternal(newChild: Expression): ZOrderExpr =
    copy(child = newChild)
}

object ZOrderExpr {
  def compute(dims: ArrayData, bitsPerDim: Int, nDims: Int): Long = {
    val n = math.min(nDims, dims.numElements())
    var out = 0L
    var j = 0
    while (j < n) {
      val v = dims.getLong(j) & ((1L << bitsPerDim) - 1)
      var i = 0
      while (i < bitsPerDim) {
        out |= ((v >>> i) & 1L) << (i * nDims + j)
        i += 1
      }
      j += 1
    }
    out
  }
}
