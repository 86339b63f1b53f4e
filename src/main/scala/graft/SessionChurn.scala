package graft

import java.nio.file.{Files, Paths}

/** Depth leg for the memo's SESSION dimension (VERDICT r13 ask #4;
  * round 13's own find, spec-only at scale until now): the
  * connection-pool shape — one long-lived driver handing out
  * `newSession()` per BI connection, each connection touching the
  * shared-table memo, each DROPPED at connection close while the
  * context lives on. Weak keys cannot reclaim those sessions (their own
  * memoized DataFrames pin them) and context-end never fires, so the
  * session-LRU cap (maxSessions 16) plus the driver-global byte ceiling
  * are the only bounds between this shape and an unbounded driver.
  * This leg cycles ≥40 such sessions through the REAL memo path
  * (`QueriesExt.shared` → `coPurchasePairCounts`) and measures both.
  *
  * Asserted (exit 1 on violation):
  *  - registered memo sessions ≤ 16 after every connection;
  *  - with GRAFT_MEMO_GLOBAL_BUDGET_MB set (the commanded run sizes it
  *    to ~3 working sets), driver-wide priced memo bytes ≤ the global
  *    budget after every build whenever >1 entry is resident across
  *    sessions (one oversize entry is admitted by design — the ceiling
  *    bounds accumulation, not a single table);
  *  - post-GC: persistent RDDs ≤ resident entries + slack and priced
  *    storage within ~1.5× the resident memo bytes — the evicted
  *    sessions' checkpoint blocks are GONE, not stranded
  *    (MEMOCHURN_r13's GC-mediated-drain discipline, applied to the
  *    session dimension).
  *
  * Usage: `runMain graft.SessionChurn <sfDir> <outJson> [nSessions]`
  */
object SessionChurn {

  def main(args: Array[String]): Unit = {
    val (sfDir, outPath, n) = args match {
      case Array(a, b)     => (a, b, 40)
      case Array(a, b, nS) => (a, b, nS.toInt)
      case _ => sys.error("usage: SessionChurn <sfDir> <outJson> [nSessions]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val root = graft.core.Sessions.builder(master, cpus).getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    val sc = root.sparkContext

    def rddCount: Int = sc.getPersistentRDDs.size
    // mem+disk of every persisted block — the block classes the memo
    // prices (the MemoChurn/MemoCompose storage discipline, ADVICE r13)
    def storageMb: Long = sc.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum / 1048576L
    def d1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

    val globalBudgetMb = sys.env.get("GRAFT_MEMO_GLOBAL_BUDGET_MB").map(_.toLong)
    val maxSessions = 16 // SessionMemo's session-LRU cap
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    var peakSessions = 0
    var peakTotalMb = 0L
    var peakRdds = 0
    val t0 = System.nanoTime()
    (1 to n).foreach { i =>
      val g0 = System.nanoTime()
      // one BI connection: fresh session, one memo-backed query, drop.
      // The block is a method-local scope so the session reference dies
      // with the iteration — exactly the pool's drop-at-close shape.
      val conn = graft.core.Sessions.tune(root.newSession())
      val cnt = QueriesExt.coPurchasePairCounts(conn, sfDir).count()
      val dt = (System.nanoTime() - g0) / 1e9
      val (sess, totMb, ents, r, st) = (QueriesExt.memoSessionCount,
        QueriesExt.memoTotalBytes / 1048576L, QueriesExt.memoTotalEntries,
        rddCount, storageMb)
      peakSessions = math.max(peakSessions, sess)
      peakTotalMb = math.max(peakTotalMb, totMb)
      peakRdds = math.max(peakRdds, r)
      rows += s"""{"conn":$i,"rows":$cnt,"sec":${d1(dt)},"sessions":$sess,"entries":$ents,"total_memo_mb":$totMb,"rdds":$r,"storage_mb":$st}"""
      if (sess > maxSessions)
        violations += s"conn $i: $sess memo sessions > cap $maxSessions"
      globalBudgetMb.foreach { b =>
        if (ents > 1 && totMb > b)
          violations += s"conn $i: total memo ${totMb}MB > global budget ${b}MB with $ents entries"
      }
    }
    val wall = (System.nanoTime() - t0) / 1e9

    // GC settle: evicted sessions' checkpoint blocks are reclaimed by
    // the weak-valued registry + ContextCleaner — force collections
    // until the persistent-RDD count stops falling
    var settle = 0
    var last = -1
    var cur = rddCount
    while (settle < 20 && cur != last) {
      last = cur
      System.gc()
      Thread.sleep(1500)
      cur = rddCount
      settle += 1
    }
    val (endSessions, endEntries, endTotalMb, endRdds, endStorage) =
      (QueriesExt.memoSessionCount, QueriesExt.memoTotalEntries,
        QueriesExt.memoTotalBytes / 1048576L, rddCount, storageMb)
    if (endRdds > endEntries + 2)
      violations += s"post-GC persistent RDDs $endRdds > entries $endEntries + 2 " +
        "(evicted sessions' checkpoints did not drain)"
    if (endStorage > endTotalMb * 3 / 2 + 64)
      violations += s"post-GC storage ${endStorage}MB > 1.5x resident memo ${endTotalMb}MB + 64"

    def jstr(s: String): String = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    val json =
      s"""{"sessions_cycled":$n,"wall_sec":${d1(wall)},"sf":${jstr(sfDir)},
         |"global_budget_mb":${globalBudgetMb.getOrElse(-1L)},"max_sessions":$maxSessions,
         |"peak_sessions":$peakSessions,"peak_total_memo_mb":$peakTotalMb,"peak_rdds":$peakRdds,
         |"end_sessions":$endSessions,"end_entries":$endEntries,"end_total_memo_mb":$endTotalMb,
         |"end_postgc_rdds":$endRdds,"end_postgc_storage_mb":$endStorage,
         |"gc_settle_rounds":$settle,
         |"violations":[${violations.map(jstr).mkString(",")}],
         |"pass":${violations.isEmpty},
         |"trajectory":[
         |${rows.mkString(",\n")}
         |]}
         |""".stripMargin
    Option(Paths.get(outPath).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outPath), json)
    println(s"[sessionchurn] $n connections, wall ${d1(wall)}s; " +
      s"sessions peak=$peakSessions end=$endSessions; " +
      s"memo peak=${peakTotalMb}MB end=${endTotalMb}MB/$endEntries entries; " +
      s"rdds peak=$peakRdds post-gc=$endRdds; storage post-gc=${endStorage}MB -> " +
      (if (violations.isEmpty) "PASS" else s"FAIL: ${violations.mkString("; ")}"))
    root.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
