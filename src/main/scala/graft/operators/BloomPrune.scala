package graft.operators

import graft.plans.{BloomContainsExpr, BloomPositionsExpr}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a compact membership filter from the
  * dim side's join keys, broadcast it as a kernel model, and drop fact rows
  * that cannot match BEFORE the join's shuffle.
  *
  * This is the pruning regime between two existing ones: a broadcast hash
  * join (dim fits as a hash map per executor) and a plain shuffle join (no
  * pruning at all). A 100M-key dim needs ~10 bits/key at 1% fpp — a 128 MB
  * bitset where the hash map would be tens of GB — and on a selective join
  * the filter eliminates most of the fact side's shuffle I/O, the dominant
  * cost at 100 TB. Spark's own runtime bloom (`spark.sql.optimizer.runtime
  * .bloomFilter.enabled`) applies the same idea opportunistically; this
  * operator makes it explicit, deterministic, and available to any plan.
  *
  * Exactness: the probe has no false negatives (it reads exactly the bits
  * the build set — shared statics in [[graft.plans.BloomHash]]), and the
  * join itself removes false positives, so the pruned join's result is
  * bit-identical to the unpruned join. Keys of any type are hashed with
  * `xxhash64` into the shared 64-bit space on both sides.
  *
  * Build cost: the explode emits k rows/key but the `bit_or` partial
  * aggregation collapses each map task's output to at most `mBits/64`
  * words, so the shuffle is bounded by partitions × words, independent of
  * dim row count. The driver materializes `mBits/64` longs (2^20 bits →
  * 16 KB; 2^30 → 128 MB — the same order as any bloom build at that
  * cardinality).
  *
  * Reference anchor: the semi-join key prefilter of
  * `apps/airflow/dags/score/etl_scores_by_subject_to_clickhouse.py` (the
  * IN-list pushdown, SURVEY §2.3 J6) — this is its scale form for key sets
  * far beyond an IN-list.
  */
object BloomPrune {

  /** Driver-held filter model: `mBits = words.length * 64` bit-space,
    * `k` probes per key. */
  final case class Model(words: Array[Long], k: Int) {
    def mBits: Int = words.length << 6
    /** Bits set — drives an fpp estimate `(setBits/mBits)^k`. */
    def setBits: Long = words.map(java.lang.Long.bitCount(_).toLong).sum
    def contains(key: Long): Boolean = BloomContainsExpr.compute(key, words, k)
  }

  import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}

  /** Any-typed key into the shared 64-bit hash space. */
  private def hashed(key: Column): Column = xxhash64(key)

  /** Size the bit-space for an expected key count at ~1% fpp with k=5:
    * next power of two >= 10·n, floor 2^10. */
  def sizeFor(expectedKeys: Long): Int = {
    val want = math.max(1024L, expectedKeys * 10L)
    require(want <= (1L << 30), s"bloom for $expectedKeys keys exceeds 2^30 bits")
    java.lang.Long.highestOneBit(want - 1).toInt << 1
  }

  /** One distributed pass over `df`: k positions per key, map-side-combined
    * `bit_or` per word, small collect. */
  def build(df: DataFrame, key: Column, mBits: Int, k: Int = 5): Model = {
    val pos = toCol(BloomPositionsExpr(toExpr(hashed(key)), mBits, k))
    val rows = df
      .select(explode(pos).as("pos"))
      .groupBy(shiftright(col("pos"), 6).as("w"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))").as("bits"))
      .collect()
    val words = new Array[Long](mBits >>> 6)
    rows.foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    Model(words, k)
  }

  /** Keep rows whose key might be a member — a pure codegen'd map, no
    * exchange; NULL keys are dropped (they cannot equi-join). */
  def filterMembers(df: DataFrame, key: Column, model: Model): DataFrame =
    df.filter(toCol(BloomContainsExpr(toExpr(hashed(key)), model.words, model.k)))

  /** Equi-join with the fact side pre-pruned through a bloom of the dim
    * side's keys. Result is exactly `fact ⋈ dim` — the bloom only removes
    * rows the join would drop anyway. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      mBits: Int = 1 << 20, k: Int = 5): DataFrame = {
    val model = build(dim, col(dimKey), mBits, k)
    filterMembers(fact, col(factKey), model).join(dim, col(factKey) === col(dimKey))
  }
}
