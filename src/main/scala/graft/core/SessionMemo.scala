package graft.core

import org.apache.spark.sql.SparkSession

/** Bounded, session-scoped memo for expensive derived values — the
  * container the "materialized-intermediate cache" pattern
  * (QueriesExt.sharedTables and friends) should have been in from the
  * start. The round-12 soak work surfaced two leak-class members in the
  * bare `TrieMap[(SparkSession, dir, key), V]` it replaces:
  *
  *  1. STRONG SESSION KEYS: a stopped SparkSession stayed reachable
  *     through the memo key forever (and through the memoized DataFrames'
  *     back-references), so none of its driver-side state could ever be
  *     collected. Here sessions are weak keys (the Caching.pending
  *     discipline) — a collected session drops its whole sub-memo.
  *
  *  2. NO CROSS-DATASET BOUND: one long-lived session scanning ROTATING
  *     data directories (a BI server over daily partitions — the §3.3
  *     shape) built one checkpointed edge table per (dir, key) and kept
  *     every one of them resident for the session's life. Here each
  *     session's sub-memo is LRU-capped at [[maxPerSession]].
  *
  * Eviction policy — deliberately GC-MEDIATED, not eager: evicting only
  * DROPS the memo's strong reference. The blocks behind a memoized
  * `localCheckpoint` are reclaimed by Spark's reference tracking
  * (weak-valued persistent-RDD registry + ContextCleaner) once the last
  * consumer's plan becomes unreachable — the drain the round-12 soak
  * measured to zero. An eager `releasePersisted` on eviction would be
  * WRONG here: a just-evicted entry can still be referenced by an
  * in-flight query's lazy plan, and a truncated checkpoint cannot be
  * recomputed after release. (Contrast RoundCheckpoints, whose rotate
  * contract guarantees the previous round has no live consumers.)
  *
  * Concurrency: the registry lock covers only map access; builds run
  * outside it, once per key, via a per-holder lazy (two threads racing
  * the same first build serialize on the holder, different keys build in
  * parallel — the Verify/Soak thread-pool shape).
  */
private[graft] final class SessionMemo[K, V](maxPerSession: Int) {

  /** lazy val gives per-holder synchronized once-only evaluation. */
  private final class Holder(build: () => V) { lazy val value: V = build() }

  /** session → LRU (access-ordered) sub-memo; weak session keys. All
    * map access synchronized on `maps` (registration and lookup are
    * construction-time, never hot). */
  private val maps = new java.util.WeakHashMap[
    SparkSession, java.util.LinkedHashMap[K, Holder]]

  def getOrBuild(s: SparkSession, k: K)(build: => V): V = {
    val holder = maps.synchronized {
      var m = maps.get(s)
      if (m == null) {
        m = new java.util.LinkedHashMap[K, Holder](16, 0.75f, true)
        maps.put(s, m)
      }
      var h = m.get(k) // access-order touch keeps hot entries resident
      if (h == null) {
        h = new Holder(() => build)
        m.put(k, h)
        while (m.size > maxPerSession) {
          val it = m.entrySet().iterator()
          it.next()
          it.remove()
        }
      }
      h
    }
    holder.value
  }

  /** Current entry count for a session (spec/soak instrumentation). */
  private[graft] def size(s: SparkSession): Int = maps.synchronized {
    Option(maps.get(s)).map(_.size).getOrElse(0)
  }
}
