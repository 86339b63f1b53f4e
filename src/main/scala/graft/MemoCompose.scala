package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** N-session composition leg (VERDICT r12 "what's missing" #4; extended
  * round 14 for the driver-GLOBAL byte ceiling): the §3.3 BI-server
  * shape is N sessions sharing one long-lived driver, each pinning its
  * OWN shared-table memo working set. Two regimes, selected by whether
  * the run sets a global budget tight enough to bite:
  *
  * CO-RESIDENCY (default, 2 sessions, no tight global cap — the r13
  * leg): both working sets must be co-resident with exact cross-session
  * isolation, and session A must stay HOT under B's builds (a re-run on
  * A must not grow A's entry count), with the post-GC driver-wide
  * resident set ≈ the sum of the single-session sets.
  *
  * GLOBAL-CAP (nSessions ≥ 3 with GRAFT_MEMO_GLOBAL_BUDGET_MB set — the
  * r14 leg, VERDICT r13 ask #3): per-session budgets compose to more
  * than any driver holds (16 × 32 GiB ≈ 512 GiB), so the engine's
  * global ceiling must evict the COLDEST session's tables once the
  * driver-wide priced sum exceeds it — bounded accumulation instead of
  * unbounded growth. Asserted: (a) driver-wide priced memo bytes ≤ the
  * global budget after every build whenever >1 entry is resident;
  * (b) the LAST session's working set is resident at the end (newest
  * stays hot); (c) the FIRST session lost at least one table to the cap
  * (coldest evicted — rebuild-on-touch, never an error); (d) post-GC,
  * persistent RDDs ≈ resident entries (evicted sessions' blocks
  * drained, not stranded).
  *
  * Usage: `runMain graft.MemoCompose <sfDir> <outJson> [queriesCsv]
  * [nSessions]` (default q122,q111,q132 / 2 sessions).
  */
object MemoCompose {

  def main(args: Array[String]): Unit = {
    val (sfDir, outPath, qcsv, nSessions) = args match {
      case Array(a, b)       => (a, b, "q122,q111,q132", 2)
      case Array(a, b, q)    => (a, b, q, 2)
      case Array(a, b, q, n) => (a, b, q, n.toInt)
      case _ => sys.error(
        "usage: MemoCompose <sfDir> <outJson> [queriesCsv] [nSessions]")
    }
    require(nSessions >= 2, s"nSessions must be >= 2, got $nSessions")
    val wanted = qcsv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val sessionA = graft.core.Sessions.builder(master, cpus).getOrCreate()
    sessionA.sparkContext.setLogLevel("WARN")
    // further sessions on the SAME context: separate session state +
    // catalog, shared block manager — the BI connection-pool shape.
    // tune() registers the graft_* SQL surface per session.
    val sessions: Seq[(String, SparkSession)] =
      ("A" -> sessionA) +: (2 to nSessions).map { i =>
        s"${('A' + i - 1).toChar}" -> graft.core.Sessions.tune(sessionA.newSession())
      }
    val sc = sessionA.sparkContext
    val globalBudgetMb = sys.env.get("GRAFT_MEMO_GLOBAL_BUDGET_MB").map(_.toLong)
    // the cap-demo regime needs ≥3 sessions AND a commanded tight budget;
    // otherwise this is the co-residency leg with its r13 assertions
    val capDemo = nSessions >= 3 && globalBudgetMb.isDefined

    def rddCount: Int = sc.getPersistentRDDs.size
    // mem+disk of every persisted block, the block classes memoBytes
    // prices — not the memory-store-only figure, which under-reads once
    // checkpoints spill to disk (ADVICE r13; same fix as MemoChurn)
    def storageMb: Long = sc.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum / 1048576L
    def d1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    def memoMb(s: SparkSession): Long = QueriesExt.memoBytes(s) / 1048576L

    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted(n.takeWhile(_ != '_')) || wanted(n) }
    require(queries.nonEmpty, s"no queries match '$qcsv'")
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    def runOn(tag: String, s: SparkSession): Unit =
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(s, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val perSession = sessions.map { case (t, ss) =>
          s""""memo_${t.toLowerCase}_mb":${memoMb(ss)}""" }.mkString(",")
        rows += s"""{"session":"$tag","q":"${name.takeWhile(_ != '_')}","sec":${d1(dt)},"rdds":$rddCount,"storage_mb":$storageMb,"total_memo_mb":${QueriesExt.memoTotalBytes / 1048576L},$perSession}"""
        globalBudgetMb.foreach { b =>
          val tot = QueriesExt.memoTotalBytes / 1048576L
          if (QueriesExt.memoTotalEntries > 1 && tot > b)
            violations += s"$tag/$name: total memo ${tot}MB > global budget ${b}MB"
        }
      }

    val t0 = System.nanoTime()
    // run every session's workload in order, snapshotting each session's
    // working set right after its OWN run (the eviction baseline)
    val afterOwn = sessions.map { case (tag, s) =>
      runOn(tag, s)
      (tag, QueriesExt.memoEntries(s), QueriesExt.memoBytes(s))
    }
    val (aEntries1, aBytes1) = (afterOwn.head._2, afterOwn.head._3)
    val atEnd = sessions.map { case (tag, s) =>
      (tag, QueriesExt.memoEntries(s), QueriesExt.memoBytes(s))
    }
    if (capDemo) {
      // (b) newest session resident
      val (lastTag, lastEntries, lastBytes) = atEnd.last
      if (lastEntries == 0 || lastBytes == 0L)
        violations += s"session $lastTag (newest) has no resident working set"
      // (c) coldest session evicted by the cap
      val (firstTag, firstEntriesEnd, firstBytesEnd) = atEnd.head
      if (firstBytesEnd >= aBytes1 && aBytes1 > 0L)
        violations += s"session $firstTag (coldest) kept its full working set " +
          s"(${firstBytesEnd / 1048576L}MB of ${aBytes1 / 1048576L}MB) — " +
          "the global cap evicted nothing"
      val _ = firstEntriesEnd
    } else {
      // co-residency: later sessions' builds must not touch A's sub-memo
      val (_, aEntries2, aBytes2) = atEnd.head
      if (aEntries2 != aEntries1 || aBytes2 == 0L)
        violations += s"session A's memo changed under other sessions' builds: " +
          s"entries $aEntries1 -> $aEntries2, bytes $aBytes2"
      atEnd.tail.foreach { case (tag, e, b) =>
        if (b == 0L || e == 0)
          violations += s"session $tag built no memo working set ($e entries)"
      }
      // hotness: a re-run on A must hit A's memo, not rebuild
      runOn("A2", sessionA)
      if (QueriesExt.memoEntries(sessionA) != aEntries1)
        violations += s"session A re-run grew its memo: $aEntries1 -> " +
          s"${QueriesExt.memoEntries(sessionA)} (displaced?)"
    }
    val wall = (System.nanoTime() - t0) / 1e9

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
    val (endRdds, endStorage) = (rddCount, storageMb)
    // per-session family residency bound (r12 sf10 rotated leg ended at
    // 3 post-GC RDDs/session) + slack; env-overridable for other SFs
    val maxRdds = sys.env.get("COMPOSE_MAX_RDDS")
      .map(_.toInt).getOrElse(8 * nSessions)
    if (endRdds > maxRdds)
      violations += s"post-GC persistent RDDs $endRdds > $maxRdds ($nSessions-session bound)"
    if (capDemo && endRdds > QueriesExt.memoTotalEntries + 2)
      violations += s"post-GC persistent RDDs $endRdds > resident entries " +
        s"${QueriesExt.memoTotalEntries} + 2 (evicted blocks did not drain)"

    def jstr(s: String): String = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    val perSessionJson = atEnd.map { case (tag, e, b) =>
      s"""{"session":${jstr(tag)},"end_entries":$e,"end_memo_mb":${b / 1048576L}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"queries":${jstr(qcsv)},"n_sessions":$nSessions,"mode":${jstr(if (capDemo) "global-cap" else "co-residency")},
         |"wall_sec":${d1(wall)},"sf":${jstr(sfDir)},
         |"global_budget_mb":${globalBudgetMb.getOrElse(-1L)},
         |"a_entries":$aEntries1,"a_memo_mb":${aBytes1 / 1048576L},
         |"end_sessions":$perSessionJson,
         |"end_total_memo_mb":${QueriesExt.memoTotalBytes / 1048576L},
         |"end_postgc_rdds":$endRdds,"end_postgc_storage_mb":$endStorage,
         |"gc_settle_rounds":$settle,"max_rdds":$maxRdds,
         |"violations":[${violations.map(jstr).mkString(",")}],
         |"pass":${violations.isEmpty},
         |"trajectory":[
         |${rows.mkString(",\n")}
         |]}
         |""".stripMargin
    Option(Paths.get(outPath).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outPath), json)
    println(s"[memocompose] $nSessions sessions x ${queries.size} queries " +
      s"(${if (capDemo) "global-cap" else "co-residency"}), wall ${d1(wall)}s; " +
      atEnd.map { case (t, e, b) => s"$t=${b / 1048576L}MB/$e" }.mkString(" ") +
      s"; total=${QueriesExt.memoTotalBytes / 1048576L}MB; " +
      s"post-gc rdds=$endRdds storage=${endStorage}MB -> " +
      (if (violations.isEmpty) "PASS" else s"FAIL: ${violations.mkString("; ")}"))
    sessionA.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
