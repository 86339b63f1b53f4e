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

/** k-lane MinHash signature over a hashed-shingle set as ONE codegen'd
  * loop per row — all lanes advance together in a single pass over the
  * array, so the signature is a pure map and needs NO explode and NO
  * aggregation shuffle (the grouped form it replaces shuffled k longs per
  * document through a hash aggregate).
  *
  * Lane math is exactly [[graft.functions.Text.minhashSignatureGrouped]]'s:
  * lane i of value x is `(x·(2i+1) + 104729·(i+1)) mod 4294967311`, the
  * signature is the per-lane minimum. Java long arithmetic (wrap + `%`
  * remainder) is Spark's non-ANSI long arithmetic, so values are
  * BIT-IDENTICAL to the grouped form (TextSpec pins it). Edge semantics
  * mirror the grouped form's explode+min shape: NULL elements are skipped
  * (min ignores nulls), an array of ONLY nulls yields a signature of k
  * nulls (the null rows still form a group whose mins are all null), and
  * an empty input yields NULL (the grouped form drops the document —
  * callers filter `isNotNull` where the drop matters). */
case class MinhashSignatureExpr(child: Expression, k: Int)
    extends UnaryExpression with Serializable {
  require(k >= 1, s"minhash lane count must be >= 1, got $k")

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = true
  override def dataType: DataType =
    ArrayType(LongType, containsNull = childContainsNull)
  override def prettyName: String = "graft_minhash"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)

  override protected def nullSafeEval(v: Any): Any =
    MinhashSignatureExpr.compute(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("mhSig")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.plans.MinhashSignatureExpr.compute($v, $k);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatureExpr =
    copy(child = newChild)
}

object MinhashSignatureExpr {
  def compute(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null // no rows to explode: the grouped form drops the doc
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val x = hs.getLong(i)
        var lane = 0
        while (lane < k) {
          val v = (x * (2L * lane + 1L) + 104729L * (lane + 1L)) % 4294967311L
          if (v < mins(lane)) mins(lane) = v
          lane += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins)
    // only-null elements: the null rows still group — every lane min is null
    else new GenericArrayData(Array.fill[Any](k)(null))
  }
}

/** 32-bit SimHash over a token-hash array as ONE codegen'd loop per row —
  * the 32 bit-counters advance together in a single pass, so the sketch is
  * a pure map with NO explode and NO aggregation shuffle (the grouped form
  * shuffled 32 partial sums per document).
  *
  * Bit j of the result is set iff Σ_tokens (bit_j(h) ? +1 : −1) ≥ 0 —
  * exactly [[graft.functions.Text.simhash32Grouped]]'s conditional-sum
  * shape, including its edge semantics: a NULL token hash contributes −1 to
  * EVERY bit (the grouped `when(...).otherwise(-1)` turns the null
  * comparison into the otherwise branch), and an empty array yields NULL
  * (the grouped form drops the document). TextSpec pins bit-equality. */
case class Simhash32Expr(child: Expression)
    extends UnaryExpression with Serializable {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)

  override protected def nullSafeEval(v: Any): Any =
    Simhash32Expr.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("simH")
      s"""
         |java.lang.Long $r = graft.plans.Simhash32Expr.compute($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash32Expr =
    copy(child = newChild)
}

object Simhash32Expr {
  def compute(ths: ArrayData): java.lang.Long = {
    val n = ths.numElements()
    if (n == 0) return null
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (ths.isNullAt(i)) {
        var j = 0
        while (j < 32) { counts(j) -= 1; j += 1 }
      } else {
        val h = ths.getLong(i)
        var j = 0
        while (j < 32) {
          counts(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) { if (counts(j) >= 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }
}

/** ALL-occurrence n-gram combine over a token-hash array as one codegen'd
  * loop — [[ShingleHashesExpr]]'s window math (`((h₁·31 + h₂)·31 + h₃)
  * mod 2³²`, n = 1 raw) WITHOUT the distinct: repetition metrics
  * (Gopher-style duplicate/top n-gram fractions) need every occurrence,
  * not the set. A window containing a NULL element yields a NULL gram;
  * fewer than n tokens yield an empty array. */
case class NgramHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  private def childContainsNull: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def dataType: DataType =
    ArrayType(LongType, containsNull = childContainsNull)
  override def prettyName: String = "graft_ngram_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)

  override protected def nullSafeEval(v: Any): Any =
    NgramHashesExpr.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.NgramHashesExpr.compute($v, $n)")

  override protected def withNewChildInternal(newChild: Expression): NgramHashesExpr =
    copy(child = newChild)
}

object NgramHashesExpr {
  def compute(th: ArrayData, n: Int): ArrayData = {
    val len = th.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    var anyNull = false
    val out = new Array[Long](m)
    val nulls = new Array[Boolean](m)
    var i = 0
    while (i < m) {
      var c = 0L
      var isNull = false
      var j = 0
      while (j < n && !isNull) {
        if (th.isNullAt(i + j)) isNull = true
        else if (n == 1) c = th.getLong(i) // raw values at width 1
        else c = (c * 31 + th.getLong(i + j)) & 0xFFFFFFFFL
        j += 1
      }
      out(i) = c
      nulls(i) = isNull
      anyNull |= isNull
      i += 1
    }
    if (!anyNull) new GenericArrayData(out)
    else {
      val boxed = new Array[Any](m)
      i = 0
      while (i < m) {
        boxed(i) = if (nulls(i)) null else java.lang.Long.valueOf(out(i))
        i += 1
      }
      new GenericArrayData(boxed)
    }
  }
}

/** 64-bit sibling of [[TokenHashesExpr]]: split on single spaces and take
  * the FIRST 16 md5 hex chars (first 8 digest bytes, big-endian) of every
  * token as an unsigned 64-bit value carried in a signed long — the same
  * engine-portable integer-from-md5 primitive (`CAST('0x' || substring(
  * md5(w), 1, 16) AS UBIGINT)` states it in DuckDB), one reused digest
  * per row. 64-bit token hashes feed the 64-bit SimHash ([[Simhash64Expr]])
  * whose banded Hamming join needs more key entropy than the 32-bit
  * sketch offers at corpus scale (Manku et al. 2007; q167's geometry). */
case class TokenHashes64Expr(child: Expression)
    extends UnaryExpression with Serializable {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes64"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(v: Any): Any =
    TokenHashes64Expr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.plans.TokenHashes64Expr.compute($v)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenHashes64Expr =
    copy(child = newChild)
}

object TokenHashes64Expr {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String): ArrayData = {
    // exactly Spark's split(text, " "): Java regex split, limit -1
    val tokens = text.toString.split(" ", -1)
    val md = mdLocal.get()
    val out = new Array[Long](tokens.length)
    var i = 0
    while (i < tokens.length) {
      md.reset()
      val d = md.digest(tokens(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 16 hex chars = first 8 bytes, big-endian; the unsigned
      // 64-bit value's bit pattern carried in a signed long
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xFFL); b += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** 64-bit SimHash over 64-bit token hashes as one codegen'd per-row kernel
  * — [[Simhash32Expr]]'s conditional-sum shape widened to 64 bit counters:
  * bit j of the result is set iff Σ_tokens (bit_j(h) ? +1 : −1) ≥ 0, a
  * NULL token hash contributes −1 to EVERY bit, an empty array yields
  * NULL. Bit 63 rides the long's sign bit — the fingerprint is the
  * unsigned 64-bit SimHash's bit pattern; consumers compare bits (xor /
  * bit_count / unsigned-shift band extraction), never magnitudes.
  * TextSpec pins bit-equality against the higher-order SQL form the
  * DuckDB oracle states. */
case class Simhash64Expr(child: Expression)
    extends UnaryExpression with Serializable {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.longArrays(prettyName, child)

  override protected def nullSafeEval(v: Any): Any =
    Simhash64Expr.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("simH64")
      s"""
         |java.lang.Long $r = graft.plans.Simhash64Expr.compute($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash64Expr =
    copy(child = newChild)
}

object Simhash64Expr {
  def compute(ths: ArrayData): java.lang.Long = {
    val n = ths.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (ths.isNullAt(i)) {
        var j = 0
        while (j < 64) { counts(j) -= 1; j += 1 }
      } else {
        val h = ths.getLong(i)
        var j = 0
        while (j < 64) {
          counts(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) >= 0) out |= (1L << j); j += 1 }
    java.lang.Long.valueOf(out)
  }
}

/** Per-profile stopword occurrence counts over a token array as ONE
  * codegen'd pass — replaces the per-profile
  * `size(filter(w, t => t.isin(words)), true)` composites, whose
  * ArrayFilter lambdas are INTERPRETED per element (higher-order functions
  * are CodegenFallback) and each materialize a filtered array just to take
  * its size; the langId+quality gates paid up to six such passes per row.
  * Slot i of the result is the MULTISET count of elements of `child` that
  * occur in `profiles(i)` — exactly the reference composite's count
  * (null elements never match: `isin` null-propagates and filter keeps
  * only true; a null ARRAY yields a null result, which call sites map to
  * the composite's `size(null, legacy) = -1`). One token can count toward
  * several profiles. TextSpec pins equality to the reference form. */
case class StopCountsExpr(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression with Serializable {
  require(profiles.nonEmpty, "StopCountsExpr needs at least one profile")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "graft_stop_counts"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.sql}")
  }

  // token -> indexes of the profiles containing it (a token may belong to
  // several); UTF8String keys = the exact equality `isin`'s InSet uses
  @transient private lazy val memberOf: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    profiles.zipWithIndex.foreach { case (words, i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  def compute(w: ArrayData): ArrayData = {
    val counts = new Array[Int](profiles.length)
    val n = w.numElements()
    var i = 0
    while (i < n) {
      if (!w.isNullAt(i)) {
        val hit = memberOf.get(w.getUTF8String(i))
        if (hit != null) {
          var j = 0
          while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopCounts", this,
      "graft.plans.StopCountsExpr")
    defineCodeGen(ctx, ev, v => s"$ref.compute($v)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopCountsExpr =
    copy(child = newChild)
}

/** Rolling polynomial fingerprint over a token-hash array as ONE codegen'd
  * loop — replaces `aggregate(hs, 0L, (acc, h) => (acc·31 + h) % p)`,
  * whose ArrayAggregate lambda is INTERPRETED per element. Bit-identical:
  * the fold is the same Java long arithmetic in the same order (the
  * reference's Multiply/Add/Remainder on longs ARE Java ops under ANSI
  * off), the empty array folds to the zero accumulator, a null array
  * yields null, and a null ELEMENT nulls the accumulator from that point
  * on — so the result is null, matching the lambda's null propagation.
  * TextSpec pins equality to the reference form. */
case class RollingFpExpr(child: Expression)
    extends UnaryExpression with Serializable {

  // null even for a non-null child: a null ELEMENT nulls the fold
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_fp"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    RollingFpExpr.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("rfp")
      s"""
         |java.lang.Long $r = graft.plans.RollingFpExpr.compute($v);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFpExpr =
    copy(child = newChild)
}

object RollingFpExpr {
  def compute(hs: ArrayData): java.lang.Long = {
    val n = hs.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (hs.isNullAt(i)) return null // null element nulls the fold
      acc = (acc * 31 + hs.getLong(i)) % 1000000007L
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
