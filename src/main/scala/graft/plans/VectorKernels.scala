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

/** Sign-LSH bucket id over the deterministic md5-derived hyperplane
  * lattice (graft.functions.Vectors.lshBucket semantics) as one codegen'd
  * loop. Plane p, dim d, seed s has component
  * `(int64(first 8 hex digits of md5("s_p_d")) mod 2001) − 1000` — the
  * same portable integer-from-md5 primitive as the text kernels, so a SQL
  * oracle can state the identical lattice. The matrix is precomputed once
  * at expression construction and rides the generated code as a reference
  * object (the NearestCentroidExpr pattern) — per-row cost is the same
  * multiply-add loop as before.
  *
  * WHY md5 and not an arithmetic progression: plane INDEPENDENCE is what
  * makes plane-count scaling work. The previous lattice
  * ((p·A + d·B + s·C) mod 2001 − 1000) generates planes that are shifted
  * arithmetic sequences of each other — strongly correlated — and the
  * 10× scale run showed the consequence: on the 20 k-vector sf1 corpus,
  * 8 planes admitted 17.6 M candidate pairs (~9 % of ALL pairs) and
  * raising to 9/12/20 planes barely helped (16.9 M / 13.1 M / 4.1 M) —
  * adding correlated planes does not split hot buckets, so candidate
  * volume stayed quadratic no matter the plane count. The md5 lattice
  * behaves like textbook independent random hyperplanes (collision
  * probability (1 − θ/π)^planes, measured to match): 1.85 M candidates
  * at 8 planes, 141 k at 12 — so `adaptivePlanes` really does bound
  * per-bucket occupancy and candidate growth becomes linear in corpus
  * size. Numbers: SCALE.md round 6.
  *
  * `seed` selects an independent lattice (multi-repetition LSH: several
  * fine-grained bucketings whose candidate union recovers the recall each
  * one loses — the hot-bucket control for near-dup at corpus scale);
  * seed 0 is [[graft.functions.Vectors.lshBucket]]'s lattice.
  */
case class SignLshBucketExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
    nPlanes: Int, seed: Int = 0)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with Serializable {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)
  @transient private lazy val coeffs: Array[Array[Long]] =
    SignLshBucketExpr.planeMatrix(nPlanes, seed)
  override protected def nullSafeEval(v: Any): Any =
    SignLshBucketExpr.compute(v.asInstanceOf[ArrayData], coeffs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftLshPlanes", coeffs, "long[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.plans.SignLshBucketExpr.compute($v, $ref)")
  }
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): SignLshBucketExpr =
    copy(child = newChild)
}

object SignLshBucketExpr {
  /** Hyperplane components for (nPlanes, seed): row p, column d is
    * `(int64(md5("seed_p_d")[0:8 hex]) mod 2001) − 1000`. Plane vectors
    * are as independent as md5 — the property plane-count scaling needs.
    * Dimension count is capped at 4096 (the quantized-embedding widths in
    * play are ≤ a few hundred); bucketing longer vectors uses the first
    * 4096 dims, which preserves the sign-LSH contract (any fixed
    * projection of independent planes is itself an independent lattice). */
  val MaxDims = 4096

  def planeMatrix(nPlanes: Int, seed: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(MaxDims) { d =>
        val digest = md.digest(s"${seed}_${p}_$d".getBytes("UTF-8"))
        val hex = digest.take(4).map(b => f"$b%02x").mkString
        java.lang.Long.parseLong(hex, 16) % 2001L - 1000L
      }
    }
  }

  def compute(qv: ArrayData, coeffs: Array[Array[Long]]): Long = {
    val n = math.min(qv.numElements(), MaxDims)
    var bucket = 0L
    var p = 0
    while (p < coeffs.length) {
      val row = coeffs(p)
      var dot = 0L
      var d = 0
      while (d < n) {
        dot += row(d) * qv.getLong(d)
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
