package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Deterministic double-hashed Bloom positions over a 64-bit key: the k
  * probe positions are `mix(key) + i·(mix(key ^ C) | 1)` masked to a
  * power-of-two bit-space (splitmix64 finalizer — full avalanche, public
  * constants). Build and probe sides share these statics, so membership is
  * bit-consistent by construction; the `| 1` keeps the stride odd, which
  * makes it a permutation of the power-of-two space (no degenerate probe
  * sequences).
  */
object BloomHash {
  final val StrideSalt = 0xC2B2AE3D27D4EB4FL

  def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** The k Bloom bit positions of a 64-bit key as `array<bigint>` — the build
  * side of [[graft.operators.BloomPrune]]: explode → `pos div 64` →
  * map-side-combined `bit_or` yields the filter's words without a custom
  * aggregate. One codegen'd loop; both hashes computed once per row. */
case class BloomPositionsExpr(child: Expression, mBits: Int, k: Int)
    extends UnaryExpression with Serializable {
  require(mBits >= 64 && (mBits & (mBits - 1)) == 0,
    s"bloom bit-space must be a power of two >= 64, got $mBits")
  require(k >= 1 && k <= 16, s"bloom probe count must be in [1,16], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_positions"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key, got ${child.dataType.sql}")

  override protected def nullSafeEval(key: Any): Any =
    BloomPositionsExpr.compute(key.asInstanceOf[Long], mBits, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, key =>
      s"graft.plans.BloomPositionsExpr.compute($key, $mBits, $k)")
  override protected def withNewChildInternal(newChild: Expression): BloomPositionsExpr =
    copy(child = newChild)
}

object BloomPositionsExpr {
  def compute(key: Long, mBits: Int, k: Int): GenericArrayData = {
    val mask = (mBits - 1).toLong
    val stride = BloomHash.mix(key ^ BloomHash.StrideSalt) | 1L
    var h = BloomHash.mix(key)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = h & mask; h += stride; i += 1 }
    new GenericArrayData(out)
  }
}

/** Bloom membership probe against a driver-built word array riding the
  * generated code as a reference object (the model-broadcast pattern of
  * [[NearestCentroidExpr]]): a pure per-row boolean, evaluated in the scan
  * stage BEFORE any exchange — the pre-shuffle pruning filter for joins
  * whose dim side is too large to broadcast-hash-join. No false negatives
  * (the probe reads exactly the bits the build set), so `filter ∘ join`
  * equals the unpruned join. */
case class BloomContainsExpr(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression with Serializable {
  require(words.nonEmpty && (words.length & (words.length - 1)) == 0,
    s"bloom word array length must be a power of two, got ${words.length}")
  require(k >= 1 && k <= 16, s"bloom probe count must be in [1,16], got $k")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a bigint key, got ${child.dataType.sql}")

  override protected def nullSafeEval(key: Any): Any =
    BloomContainsExpr.compute(key.asInstanceOf[Long], words, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomWords", words, "long[]")
    defineCodeGen(ctx, ev, key =>
      s"graft.plans.BloomContainsExpr.compute($key, $ref, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomContainsExpr =
    copy(child = newChild)
}

object BloomContainsExpr {
  def compute(key: Long, words: Array[Long], k: Int): Boolean = {
    val mask = ((words.length.toLong << 6) - 1)
    val stride = BloomHash.mix(key ^ BloomHash.StrideSalt) | 1L
    var h = BloomHash.mix(key)
    var i = 0
    while (i < k) {
      val pos = (h & mask).toInt
      // 1L << pos reads only the low 6 bits of pos in Java — exactly pos % 64
      if ((words(pos >>> 6) & (1L << pos)) == 0L) return false
      h += stride
      i += 1
    }
    true
  }
}
