package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared analysis-time input validation for the kernel expressions: every
  * child must be `array<bigint>`, so misuse (wrong column type, non-array)
  * fails analysis with the function name instead of a runtime
  * ClassCastException from the kernel. */
object GraftTypeChecks {
  def longArrays(name: String, children: Expression*): TypeCheckResult = {
    val bad = children.collectFirst {
      case c if !c.dataType.isInstanceOf[ArrayType] ||
        c.dataType.asInstanceOf[ArrayType].elementType != LongType => c.dataType
    }
    bad match {
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<bigint> arguments, got ${t.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** Codegen'd integer vector kernels over quantized `array<bigint>`
  * embeddings — the hot inner loops of every similarity operator
  * (cosine top-k, LSH ANN, IVF, embedding near-dup).
  *
  * The `zip_with`/`aggregate` higher-order forms evaluate an interpreted
  * lambda per dimension per pair — at 97k candidate pairs × 64 dims that is
  * millions of boxed calls per query. These expressions run one tight
  * primitive loop per pair via the shared static kernel, inside whole-stage
  * codegen. Exact int64 math — results are bit-identical to the
  * higher-order forms they replace.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_q"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, left, right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.QuantizedDot.compute($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
}

/** Exact squared L2 distance — see [[QuantizedDot]]. */
case class QuantizedL2Sq(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_l2sq_q"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, left, right)
  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizedL2Sq.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.QuantizedL2Sq.compute($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedL2Sq =
    copy(left = newLeft, right = newRight)
}

object QuantizedL2Sq {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { val d = a.getLong(i) - b.getLong(i); acc += d * d; i += 1 }
    acc
  }
}

/** Fixed-point quantization `floor(x·1e6)` of an `array<float>` embedding
  * into `array<bigint>` as one codegen'd loop — the entry projection of
  * every similarity operator; the `transform` higher-order form evaluates
  * an interpreted lambda per dimension per row. Semantics identical to
  * `transform(v, x => floor(x * 1e6).cast(long))` under non-ANSI casts
  * (float widens to double, floor, truncating long cast — NaN → 0,
  * ±Inf → Long.Max/Min; NULL elements stay NULL and the output's
  * containsNull mirrors the input's), pinned by DeterministicVectorsSpec.
  */
case class QuantizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = childContainsNull)
  override def prettyName: String = "graft_quantize"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${t.sql}")
  }
  override protected def nullSafeEval(v: Any): Any =
    QuantizeExpr.compute(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.QuantizeExpr.compute($v)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeExpr =
    copy(child = newChild)
}

object QuantizeExpr {
  private def q(f: Float): Long =
    // identical to Spark's non-ANSI double→long cast of floor(x·1e6)
    Math.floor(f.toDouble * 1000000.0d).toLong

  def compute(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var hasNull = false
    var i = 0
    while (i < n && !hasNull) { hasNull = v.isNullAt(i); i += 1 }
    if (!hasNull) {
      val out = new Array[Long](n)
      i = 0
      while (i < n) { out(i) = q(v.getFloat(i)); i += 1 }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    } else {
      // null dimensions stay null, exactly like the transform form
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) = if (v.isNullAt(i)) null else java.lang.Long.valueOf(q(v.getFloat(i)))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

/** Sign-LSH bucket id over the deterministic hyperplane lattice
  * (graft.functions.Vectors.lshBucket semantics) as one codegen'd loop —
  * plane components are regenerated arithmetically in-register, so no
  * plane matrix is stored or broadcast.
  *
  * `seed` selects an independent lattice (multi-repetition LSH: several
  * fine-grained bucketings whose candidate union recovers the recall each
  * one loses — the hot-bucket control for near-dup at corpus scale);
  * seed 0 is the original lattice.
  */
case class SignLshBucketExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
    nPlanes: Int, seed: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)
  override protected def nullSafeEval(v: Any): Any =
    SignLshBucketExpr.compute(v.asInstanceOf[ArrayData], nPlanes, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.SignLshBucketExpr.compute($v, $nPlanes, $seed)")
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): SignLshBucketExpr =
    copy(child = newChild)
}

object SignLshBucketExpr {
  def compute(qv: ArrayData, nPlanes: Int, seed: Int): Long = {
    val n = qv.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0L
      var d = 0
      while (d < n) {
        dot += ((p * 73856093L + d * 19349663L + seed * 83492791L) % 2001L - 1000L) *
          qv.getLong(d)
        d += 1
      }
      bucket = bucket * 2 + (if (dot >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }
}

/** Nearest-centroid assignment over a broadcast centroid matrix as one
  * codegen'd loop: argmin over exact int64 squared-L2 distances, ties to
  * the lower index. The centroid matrix rides the generated code as a
  * reference object (the KMeans-model-broadcast pattern), so assignment is
  * a pure per-row map — the building block of IVF list assignment and
  * Lloyd iterations ([[graft.operators.Ivf]]) with NO exchange and no
  * per-centroid literal columns (k literal struct columns blow up the plan
  * for k beyond a few dozen). */
case class NearestCentroidExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
    centroids: Array[Array[Long]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  require(centroids.nonEmpty, "nearest-centroid needs at least one centroid")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_nearest_centroid"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)

  override protected def nullSafeEval(v: Any): Any =
    NearestCentroidExpr.compute(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCentroids", centroids, "long[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.NearestCentroidExpr.compute($v, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NearestCentroidExpr =
    copy(child = newChild)
}

object NearestCentroidExpr {
  def compute(v: ArrayData, cents: Array[Array[Long]]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var acc = 0L
      var i = 0
      while (i < n) { val d = v.getLong(i) - cent(i); acc += d * d; i += 1 }
      if (acc < bestD) { bestD = acc; best = c }
      c += 1
    }
    best
  }
}
