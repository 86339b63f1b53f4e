package graft.core

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
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
  *     collected. Sessions are weak keys here, but weak keys alone are
  *     NOT the fix (ADVICE r13): a memoized DataFrame strongly references
  *     its session, and the build closure captures the call site — both
  *     reach the key from inside the value, which per WeakHashMap
  *     semantics pins the entry forever. So (a) each holder DROPS its
  *     build closure once evaluated, and (b) a context-end listener
  *     clears every sub-memo of the stopped context — the signal that
  *     needs no reachability argument at all.
  *
  *  2. NO CROSS-DATASET BOUND: one long-lived session scanning ROTATING
  *     data directories (a BI server over daily partitions — the §3.3
  *     shape) built one checkpointed edge table per (dir, key) and kept
  *     every one of them resident for the session's life. Here each
  *     session's sub-memo is LRU-capped at [[maxPerSession]] entries AND
  *     — because entry caps don't bound bytes (one sf10 edge table is
  *     ~14 GB materialized) — at [[budgetBytes]] measured via [[sizeOf]]
  *     (VERDICT r12 "what's wrong" #3: the soak's rdd-disk exemption
  *     needed a budget of its own).
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
  *
  * @param maxPerSession LRU entry cap per session
  * @param budgetBytes   LRU byte cap per session over EVALUATED entries
  *                      (the most recent entry is never evicted — the
  *                      caller just built it); default unlimited
  * @param sizeOf        measures one evaluated value's resident bytes
  *                      (e.g. the mem+disk blocks behind a checkpointed
  *                      DataFrame); required iff budgetBytes is set
  */
private[graft] final class SessionMemo[K, V](
    maxPerSession: Int,
    budgetBytes: Long = Long.MaxValue,
    sizeOf: V => Long = null,
    maxSessions: Int = 16) {

  /** lazy val gives per-holder synchronized once-only evaluation. The
    * build closure is DROPPED after evaluation: it captures the call
    * site and through it the SparkSession, and a retained closure would
    * strongly reference the WeakHashMap key from its own value — the
    * exact pinning the weak keys exist to avoid (ADVICE r13). */
  private final class Holder(b: () => V) {
    private var build: () => V = b
    @volatile private[SessionMemo] var done = false
    lazy val value: V = {
      val v = build()
      build = null
      done = true
      v
    }
    private[SessionMemo] def peek: Option[V] = if (done) Some(value) else None
  }

  /** One session's sub-memo plus its last-access stamp (monotonic
    * nanos) — the stamp orders sessions for [[maxSessions]] eviction. */
  private final class Sub {
    val entries = new java.util.LinkedHashMap[K, Holder](16, 0.75f, true)
    @volatile var lastTouch: Long = System.nanoTime()
  }

  /** session → sub-memo; weak session keys. All map access synchronized
    * on `maps` (registration and lookup are construction-time, never
    * hot).
    *
    * Weak keys alone cannot reclaim a DROPPED-but-unstopped session
    * (the connection-pool shape: `newSession()` per BI connection,
    * dropped at connection close while the context lives on): its
    * DataFrame memo values reach the session, pinning the key, and the
    * context-end listener never fires. So the SESSION DIMENSION is
    * LRU-bounded too ([[maxSessions]]): registering session N+1 drops
    * the least-recently-touched other session's sub-memo — eviction is
    * the usual GC-mediated reference drop, and a live session that gets
    * evicted merely rebuilds its memo on next use (it is a cache). */
  private val maps = new java.util.WeakHashMap[SparkSession, Sub]

  /** Contexts that already carry our end-of-life listener (weak keys —
    * the listener itself lives on the context's bus, not here). */
  private val hooked = new java.util.WeakHashMap[SparkContext, java.lang.Boolean]

  def getOrBuild(s: SparkSession, k: K)(build: => V): V = {
    val holder = maps.synchronized {
      hookContextEnd(s.sparkContext)
      var sub = maps.get(s)
      if (sub == null) {
        sub = new Sub
        maps.put(s, sub)
        // session-dimension LRU: drop the least-recently-touched OTHER
        // session once more than maxSessions are registered (the
        // dropped-connection-session bound; see `maps` doc)
        var evicting = maps.size > maxSessions
        while (evicting) {
          var eldest: SparkSession = null
          var eldestTouch = Long.MaxValue
          val it = maps.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if ((e.getKey ne s) && e.getValue.lastTouch < eldestTouch) {
              eldest = e.getKey
              eldestTouch = e.getValue.lastTouch
            }
          }
          if (eldest != null) maps.remove(eldest)
          evicting = eldest != null && maps.size > maxSessions
        }
      }
      sub.lastTouch = System.nanoTime()
      holderFor(sub, k, () => build)
    }
    val v = holder.value
    if (budgetBytes != Long.MaxValue && sizeOf != null) enforceBudget(s)
    v
  }

  /** Entry lookup-or-insert inside one session's sub-memo, with the
    * per-session entry-count LRU cap. Caller holds the maps lock. */
  private def holderFor(sub: Sub, k: K, build: () => V): Holder = {
    val m = sub.entries
    var h = m.get(k) // access-order touch keeps hot entries resident
    if (h == null) {
      h = new Holder(build)
      m.put(k, h)
      while (m.size > maxPerSession) {
        val it = m.entrySet().iterator()
        it.next()
        it.remove()
      }
    }
    h
  }

  /** Byte-budget pass, after a build completed: evict least-recently-
    * used entries until the session's measured evaluated bytes fit
    * [[budgetBytes]] — but never the last remaining entry (the one the
    * caller just built must stay memoized, even if it alone exceeds the
    * budget; the budget bounds accumulation, not a single table). */
  private def enforceBudget(s: SparkSession): Unit = maps.synchronized {
    val sub = maps.get(s)
    if (sub != null) {
      val m = sub.entries
      def measured(h: Holder): Long = h.peek.map(sizeOf).getOrElse(0L)
      var total = 0L
      m.values.forEach(h => total += measured(h))
      while (total > budgetBytes && m.size > 1) {
        val it = m.entrySet().iterator()
        total -= measured(it.next().getValue)
        it.remove()
      }
    }
  }

  /** Once per SparkContext: when the context ends (SparkSession.stop
    * stops the context), drop every sub-memo of its sessions. Weak keys
    * cannot do this — DataFrame values reach their session — so context
    * end is the lifetime signal (ADVICE r13). Caller holds the maps
    * lock. */
  private def hookContextEnd(sc: SparkContext): Unit =
    if (!hooked.containsKey(sc)) {
      hooked.put(sc, java.lang.Boolean.TRUE)
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          dropSessionsOf(sc)
      })
    }

  /** Remove every session of `sc` from the memo (the context-end
    * listener's body; package-visible so the spec can pin the behavior
    * without stopping the suite's shared context). */
  private[graft] def dropSessionsOf(sc: SparkContext): Unit =
    maps.synchronized {
      val it = maps.keySet.iterator()
      while (it.hasNext) if (it.next().sparkContext eq sc) it.remove()
    }

  /** Current entry count for a session (spec/soak instrumentation). */
  private[graft] def size(s: SparkSession): Int = maps.synchronized {
    Option(maps.get(s)).map(_.entries.size).getOrElse(0)
  }

  /** Number of sessions currently registered (the [[maxSessions]]
    * bound's observable). */
  private[graft] def sessionCount: Int = maps.synchronized(maps.size)

  /** Measured resident bytes of a session's EVALUATED entries (0 without
    * a sizer) — the soak's `memo_bytes` line and the budget's input. */
  private[graft] def bytes(s: SparkSession): Long =
    entriesSized(s).map(_._2).sum

  /** (key, measured bytes) per evaluated entry — the breakdown behind
    * [[bytes]], so a bound FAIL names WHICH tables carry the weight
    * instead of one opaque sum (the round-12 "instrument before
    * concluding" lesson, applied to the memo gate). */
  private[graft] def entriesSized(s: SparkSession): Seq[(K, Long)] =
    maps.synchronized {
      val sub = maps.get(s)
      if (sub == null || sizeOf == null) Seq.empty
      else {
        val out = Seq.newBuilder[(K, Long)]
        sub.entries.forEach((k, h) => h.peek.foreach(v => out += k -> sizeOf(v)))
        out.result()
      }
    }
}
