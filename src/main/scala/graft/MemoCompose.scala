package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Two-session composition leg (VERDICT r12 "what's missing" #4): the
  * §3.3 BI-server shape is N sessions sharing one long-lived driver,
  * and each session pins its OWN shared-table memo working set — the
  * per-session byte budget (core/SessionMemo) bounds each, but the
  * composition had no measured leg. This runs the memo-heavy family on
  * TWO sessions of one driver (`spark.newSession()` — shared context,
  * separate session state, the Metabase-connection-pool shape), then:
  *
  *  - reports per-session memo entries + measured bytes (the budget's
  *    observable) and the driver-wide resident set;
  *  - asserts both working sets are co-resident (each session's memo
  *    bytes > 0 — neither evicted the other's: the memo is
  *    session-keyed, so cross-session interference would be a defect);
  *  - asserts session A's memo is still HOT after B's builds (a re-run
  *    query on A must not grow A's entry count — rebuild would mean B
  *    displaced A);
  *  - asserts the post-GC driver-wide resident set is ≈ the SUM of two
  *    single-session sets, bounded (2× the r12 single-session family
  *    bound), not 2× leaked garbage.
  *
  * Usage: `runMain graft.MemoCompose <sfDir> <outJson> [queriesCsv]`
  * (default q122,q111,q132 — the cheap third of the sf10 rotated
  * family, populating the co-purchase edge, BPE rules, and LPA memo
  * tables).
  */
object MemoCompose {

  def main(args: Array[String]): Unit = {
    val (sfDir, outPath, qcsv) = args match {
      case Array(a, b)    => (a, b, "q122,q111,q132")
      case Array(a, b, q) => (a, b, q)
      case _ => sys.error("usage: MemoCompose <sfDir> <outJson> [queriesCsv]")
    }
    val wanted = qcsv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val sessionA = graft.core.Sessions.builder(master, cpus).getOrCreate()
    sessionA.sparkContext.setLogLevel("WARN")
    // second session on the SAME context: separate session state +
    // catalog, shared block manager — the BI connection-pool shape.
    // tune() registers the graft_* SQL surface per session.
    val sessionB = graft.core.Sessions.tune(sessionA.newSession())
    val sc = sessionA.sparkContext

    def rddCount: Int = sc.getPersistentRDDs.size
    def storageMb: Long = sc.getExecutorMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum / 1048576L
    def d1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

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
        rows += s"""{"session":"$tag","q":"${name.takeWhile(_ != '_')}","sec":${d1(dt)},"rdds":$rddCount,"storage_mb":$storageMb,"memo_a_mb":${QueriesExt.memoBytes(sessionA) / 1048576L},"memo_b_mb":${QueriesExt.memoBytes(sessionB) / 1048576L}}"""
      }

    val t0 = System.nanoTime()
    runOn("A", sessionA)
    val (aEntries1, aBytes1) =
      (QueriesExt.memoEntries(sessionA), QueriesExt.memoBytes(sessionA))
    runOn("B", sessionB)
    val (aEntries2, aBytes2, bEntries, bBytes) =
      (QueriesExt.memoEntries(sessionA), QueriesExt.memoBytes(sessionA),
        QueriesExt.memoEntries(sessionB), QueriesExt.memoBytes(sessionB))
    // co-residency: B's builds must not have touched A's sub-memo
    if (aEntries2 != aEntries1 || aBytes2 == 0L)
      violations += s"session A's memo changed under B's builds: " +
        s"entries $aEntries1 -> $aEntries2, bytes $aBytes2"
    if (bBytes == 0L || bEntries == 0)
      violations += s"session B built no memo working set ($bEntries entries)"
    // hotness: a re-run on A must hit A's memo, not rebuild
    runOn("A2", sessionA)
    if (QueriesExt.memoEntries(sessionA) != aEntries1)
      violations += s"session A re-run grew its memo: $aEntries1 -> " +
        s"${QueriesExt.memoEntries(sessionA)} (displaced by B?)"
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
    // 2x the single-session family residency (r12 sf10 rotated leg ended
    // at 3 post-GC RDDs) + slack; env-overridable for other SFs
    val maxRdds = sys.env.getOrElse("COMPOSE_MAX_RDDS", "16").toInt
    if (endRdds > maxRdds)
      violations += s"post-GC persistent RDDs $endRdds > $maxRdds (2-session bound)"

    def jstr(s: String): String = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    val json =
      s"""{"queries":${jstr(qcsv)},"wall_sec":${d1(wall)},"sf":${jstr(sfDir)},
         |"a_entries":$aEntries1,"a_memo_mb":${aBytes2 / 1048576L},
         |"b_entries":$bEntries,"b_memo_mb":${bBytes / 1048576L},
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
    println(s"[memocompose] 2 sessions x ${queries.size} queries, wall ${d1(wall)}s; " +
      s"A memo=${aBytes2 / 1048576L}MB/$aEntries1 entries, " +
      s"B memo=${bBytes / 1048576L}MB/$bEntries entries; " +
      s"post-gc rdds=$endRdds storage=${endStorage}MB -> " +
      (if (violations.isEmpty) "PASS" else s"FAIL: ${violations.mkString("; ")}"))
    sessionA.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
