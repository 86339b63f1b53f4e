package graft.core

import org.apache.spark.SparkContext

/** Storage rotation for bounded-fixpoint operators — the generalization
  * of the round-11 kCore fix (SCALE.md: `localCheckpoint`ing loop state
  * EVERY round accumulates O(rounds × state) storage blocks; at sf10 the
  * edge-sized variant GC-thrashed a 32 GB driver into RPC-timeout
  * shutdown, and the node-sized variants carry the same growth one data
  * decade further out).
  *
  * `localCheckpoint` persists at the RDD layer, which `Dataset.unpersist`
  * cannot reach — the blocks outlive the Dataset reference and are only
  * dropped when the SparkContext dies. The release that works is the
  * persistent-RDD registry diff: snapshot `sc.getPersistentRDDs` around a
  * round's eager checkpoints, and once the NEW round's state is
  * materialized, unpersist the PREVIOUS round's ids. Peak storage is then
  * two rounds of state at any iteration depth.
  *
  * Usage — every loop iteration REPLACES the carried state inside one
  * [[rotate]] block:
  *
  * {{{
  * val rc = new RoundCheckpoints(spark.sparkContext)
  * var state = rc.rotate { init.localCheckpoint() }
  * while (...) state = rc.rotate { step(state).localCheckpoint() }
  * state // last round's blocks are never released — they ARE the result
  * }}}
  *
  * Contract (same as the original kCore closure):
  *  - everything `localCheckpoint`ed/`persist`ed inside a `rotate` body is
  *    released when the NEXT `rotate` completes — state carried ACROSS
  *    rounds (the shared edge table, a dimension broadcast) must be
  *    materialized OUTSIDE any rotate;
  *  - a rotate body must consume the previous round's state eagerly
  *    (localCheckpoint is eager) — after the body returns, that state is
  *    gone and its lineage is truncated, so it cannot be recomputed;
  *  - construction is single-threaded per query (the engine-wide
  *    convention) — the registry diff would capture a concurrent query's
  *    RDDs otherwise;
  *  - intra-round `cache()`/`unpersist()` pairs compose fine: a Dataset
  *    unpersist removes the id from the registry, and release no-ops on
  *    ids that are no longer registered. */
private[graft] final class RoundCheckpoints(sc: SparkContext) {
  private var prevIds = Set.empty[Int]

  /** Run one round: `body` eagerly materializes this round's checkpoints;
    * afterwards the PREVIOUS round's blocks are released. Returns body's
    * result. */
  def rotate[T](body: => T): T = {
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = body
    val fresh = sc.getPersistentRDDs.keySet.toSet -- before
    prevIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    prevIds = fresh
    out
  }
}
