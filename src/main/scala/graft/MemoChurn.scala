package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Depth leg for [[graft.core.SessionMemo]] eviction under DIRECTORY
  * CHURN — the daily-partition BI regime the memo's caps exist for
  * (VERDICT r12 "what's missing" #3): one long-lived session scans N
  * rotating data-dir generations; each generation builds one shared
  * edge table through the REAL memo path (`QueriesExt.shared` →
  * `coPurchasePairCounts`), and the memo must hold its entry cap AND
  * its byte budget while the evicted generations' checkpoint blocks
  * actually drain once GC runs.
  *
  * Generations are symlink farms over one source dataset (20 distinct
  * dir strings → 20 distinct memo keys, zero copy cost), so the leg
  * measures MEMO behavior, not I/O.
  *
  * Asserted (exit 1 on violation):
  *  - peak memo entries ≤ the sharedTables cap (8) at every step;
  *  - with GRAFT_MEMO_BUDGET_MB set (the commanded run sizes it to ~2
  *    generations), measured memo bytes ≤ budget after every build
  *    whenever >1 entry is resident (a single oversize entry is allowed
  *    by design — the budget bounds accumulation, not one table);
  *  - post-GC: persistent RDDs ≤ end entries + slack and storage within
  *    ~1.5× the resident memo bytes — i.e. the ~18 evicted generations'
  *    blocks are GONE, not stranded (the GC-mediated drain, measured).
  *
  * Usage: `runMain graft.MemoChurn <sfDir> <outJson> [generations]`
  */
object MemoChurn {

  def main(args: Array[String]): Unit = {
    val (sfDir, outPath, gens) = args match {
      case Array(a, b)    => (a, b, 20)
      case Array(a, b, g) => (a, b, g.toInt)
      case _ => sys.error("usage: MemoChurn <sfDir> <outJson> [generations]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = graft.core.Sessions.builder(master, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    // symlink farm: gen-i/<table>.parquet -> sfDir/<table>.parquet
    val base = Files.createTempDirectory("memochurn-")
    val src = Paths.get(sfDir).toAbsolutePath
    val genDirs = (1 to gens).map { i =>
      val d = base.resolve(s"gen-$i")
      Files.createDirectory(d)
      val it = Files.list(src).iterator()
      while (it.hasNext) {
        val f = it.next()
        Files.createSymbolicLink(d.resolve(f.getFileName.toString), f)
      }
      d.toString
    }

    def rddCount: Int = sc.getPersistentRDDs.size
    // mem+disk of every persisted block — the SAME block classes
    // memoBytes prices, so the post-GC drain bound compares like with
    // like (ADVICE r13: the memory-store-only getExecutorMemoryStatus
    // figure passed trivially whenever checkpoints spilled to disk)
    def storageMb: Long = sc.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum / 1048576L
    def memoMb: Long = QueriesExt.memoBytes(spark) / 1048576L
    def d1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

    val budgetMb = sys.env.get("GRAFT_MEMO_BUDGET_MB").map(_.toLong)
    val cap = 8 // sharedTables' entry cap (QueriesExt)
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    var peakEntries = 0
    var peakRdds = 0
    var peakStorage = 0L
    val t0 = System.nanoTime()
    genDirs.zipWithIndex.foreach { case (dir, i) =>
      val g0 = System.nanoTime()
      // the REAL consumer shape: build the generation's shared edge
      // table through the memo, then aggregate over it (q122's first
      // step) — the memoized checkpoint is what must rotate out later
      val n = QueriesExt.coPurchasePairCounts(spark, dir).count()
      val dt = (System.nanoTime() - g0) / 1e9
      val (e, mb, r, st) = (QueriesExt.memoEntries(spark), memoMb, rddCount, storageMb)
      peakEntries = math.max(peakEntries, e)
      peakRdds = math.max(peakRdds, r)
      peakStorage = math.max(peakStorage, st)
      rows += s"""{"gen":${i + 1},"rows":$n,"sec":${d1(dt)},"entries":$e,"memo_mb":$mb,"rdds":$r,"storage_mb":$st}"""
      if (e > cap) violations += s"gen ${i + 1}: memo entries $e > cap $cap"
      budgetMb.foreach { b =>
        if (e > 1 && mb > b)
          violations += s"gen ${i + 1}: memo ${mb}MB > budget ${b}MB with $e entries"
      }
    }
    val wall = (System.nanoTime() - t0) / 1e9

    // GC settle (the Soak discipline): evicted generations' blocks are
    // reclaimed by the weak-valued registry + ContextCleaner — force
    // collections until the count stops falling
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
    val (endEntries, endMemoMb, endRdds, endStorage) =
      (QueriesExt.memoEntries(spark), memoMb, rddCount, storageMb)
    if (endRdds > endEntries + 2)
      violations += s"post-GC persistent RDDs $endRdds > entries $endEntries + 2 " +
        "(evicted generations' checkpoints did not drain)"
    if (endStorage > endMemoMb * 3 / 2 + 64)
      violations += s"post-GC storage ${endStorage}MB > 1.5x resident memo ${endMemoMb}MB + 64"

    def jstr(s: String): String = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    val json =
      s"""{"generations":$gens,"wall_sec":${d1(wall)},"sf":${jstr(sfDir)},
         |"budget_mb":${budgetMb.getOrElse(-1L)},"cap":$cap,
         |"peak_entries":$peakEntries,"peak_rdds":$peakRdds,"peak_storage_mb":$peakStorage,
         |"end_entries":$endEntries,"end_memo_mb":$endMemoMb,
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
    println(s"[memochurn] $gens generations, wall ${d1(wall)}s; " +
      s"entries peak=$peakEntries end=$endEntries; memo end=${endMemoMb}MB; " +
      s"rdds peak=$peakRdds post-gc=$endRdds; storage peak=${peakStorage}MB " +
      s"post-gc=${endStorage}MB -> " +
      (if (violations.isEmpty) "PASS" else s"FAIL: ${violations.mkString("; ")}"))
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
