package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenize-and-hash as ONE codegen'd kernel: split on single spaces and
  * md5-hash every token (first 8 hex chars as an unsigned 32-bit value in
  * a long) in a single tight loop with one reused MessageDigest per row.
  *
  * This replaces `transform(split(text, " "), w => hash32(w))`, whose
  * lambda is INTERPRETED per element (higher-order functions don't
  * codegen) and whose md5 path allocates a digest per token — the
  * dominant cost of the cold near-dup/fingerprint pipeline (q31/q32/q33/
  * q39/q48 all start here). Values are BIT-IDENTICAL to the higher-order
  * form (TextSpec proves it over the real corpus): same split semantics
  * (Java regex " " with limit -1, exactly Spark's `split(text, ' ')`),
  * same md5-prefix hash, so the DuckDB oracle derivations are untouched.
  */
case class TokenHashesExpr(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    TokenHashesExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.TokenHashesExpr.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
}

object TokenHashesExpr {
  // MessageDigest is not thread-safe but IS reusable: one instance per
  // executor thread, reset per token — no per-row getInstance allocation
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String): ArrayData = {
    // exactly Spark's split(text, " "): Java regex split, limit -1
    // (single-space pattern → fast path, no actual regex engine involved)
    val tokens = text.toString.split(" ", -1)
    val md = mdLocal.get()
    val out = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      md.reset()
      val d = md.digest(tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars = first 4 bytes, unsigned
      out(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct n-gram shingle combine over a token-hash array as one
  * codegen'd loop: `((h₁·31 + h₂)·31 + h₃) mod 2³²` per window, first-
  * occurrence-ordered dedup — bit-identical to the zip_with-reduce +
  * array_distinct formulation (TextSpec proves it), which pays an
  * interpreted lambda per (window × n) plus two materialized slice arrays
  * per level. Matches that form's edge semantics exactly: per-step masking
  * equals pmod(·, 2³²) for ALL longs (modular arithmetic, incl. negative
  * and 2⁶⁴-wrapping values); n = 1 returns RAW deduped elements (the
  * reduce degenerates to array_distinct with no pmod); a window containing
  * a NULL element yields one NULL shingle (null propagates through the
  * lambda, array_distinct keeps the first). */
case class ShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = childContainsNull)
  override def prettyName: String = "graft_shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)

  override protected def nullSafeEval(v: Any): Any =
    ShingleHashesExpr.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.ShingleHashesExpr.compute($v, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

object ShingleHashesExpr {
  def compute(th: ArrayData, n: Int): ArrayData = {
    val len = th.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    // LinkedHashSet: dedup preserving first occurrence — array_distinct's
    // exact order contract (one null allowed, like array_distinct)
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    var i = 0
    while (i < m) {
      var c = 0L
      var isNull = false
      var j = 0
      while (j < n && !isNull) {
        if (th.isNullAt(i + j)) isNull = true
        else if (n == 1) c = th.getLong(i) // raw: the n=1 reduce never pmods
        else c = (c * 31 + th.getLong(i + j)) & 0xFFFFFFFFL
        j += 1
      }
      seen.add(if (isNull) null else java.lang.Long.valueOf(c))
      i += 1
    }
    if (!seen.contains(null)) {
      val out = new Array[Long](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
  }
}
