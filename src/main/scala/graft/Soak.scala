package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** One-session soak over every `SparkEntry.queries` entry with NO
  * `clearCache()` between queries — the §3.3 interactive-session regime
  * (a BI tool holds one session open all day and never calls
  * clearCache), which every other harness (Bench, Verify, preflight)
  * masks by isolating queries. This is the regime where the round-11
  * storage-leak class (kCore's per-round checkpoints, the Caching
  * construction orphans) bites a real user, so the composed property
  * gets its own commanded gate (VERDICT r11 ask #1):
  *
  *  - run all queries back-to-back in ONE JVM/session, recording the
  *    persistent-RDD count, executor storage-memory use, pending
  *    Caching listeners, and catalog temp-view count after each;
  *  - at the end, force GC and let Spark's ContextCleaner drain (the
  *    weak-valued persistent-RDD registry + reference tracking reclaim
  *    blocks whose RDD objects became unreachable — one-shot result
  *    checkpoints are SUPPOSED to converge to zero this way);
  *  - assert the post-GC session state is bounded: leaked RDDs under a
  *    small constant, pending listeners under the Caching cap, storage
  *    bytes near zero, temp views bounded.
  *
  * Exit 0 + `soak.json` artifact on pass; exit 1 with the violated
  * bound named on fail. Intentional session residents are allowed for:
  * the QueriesExt shared-table memo localCheckpoints (bounded by
  * distinct (session, dir, key) — they ARE the session's working set)
  * and rotated-loop final-round results until their consumers' Dataset
  * objects are collected.
  *
  * Usage: `runMain graft.Soak <sfDir> <outJson> [onlyCsv]`; bounds are
  * env-overridable (SOAK_MAX_RDDS, SOAK_MAX_STORAGE_MB,
  * SOAK_MAX_VIEWS).
  */
object Soak {

  def main(args: Array[String]): Unit = {
    val (sfDir, outPath, only) = args match {
      case Array(a, b)    => (a, b, Set.empty[String])
      case Array(a, b, f) => (a, b, f.split(",").map(_.trim).toSet)
      case _ => sys.error("usage: Soak <sfDir> <outJson> [onlyCsv]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    def rddCount: Int = sc.getPersistentRDDs.size
    def storageMb: Long = sc.getExecutorMemoryStatus.values
      .map { case (max, remaining) => max - remaining }.sum / 1048576L
    def views: Long = spark.catalog.listTables().count()
    def pending: Int = graft.core.Caching.pendingCount(spark)
    // Locale.ROOT everywhere a double is rendered: a comma decimal
    // separator would make the artifact invalid JSON (the Bench lesson)
    def d1(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    def d3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val t0 = System.nanoTime()
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var peakRdds = 0
    var peakStorageMb = 0L
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(e => only.isEmpty || only(e._1))
    queries.foreach { case (name, fn) =>
      val q0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
      }
      val dt = (System.nanoTime() - q0) / 1e9
      val (r, s, p) = (rddCount, storageMb, pending)
      peakRdds = math.max(peakRdds, r)
      peakStorageMb = math.max(peakStorageMb, s)
      rows += s"""{"q":"${name.takeWhile(_ != '_')}","sec":${d3(dt)},"rdds":$r,"storage_mb":$s,"pending":$p}"""
      // NO clearCache() — that absence is the whole point
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val (rawRdds, rawStorage) = (rddCount, storageMb)

    // GC-settle: the weak-valued registry + ContextCleaner reclaim
    // asynchronously; force collections until the count stops falling.
    var settleRounds = 0
    var last = -1
    var cur = rddCount
    while (settleRounds < 10 && cur != last) {
      last = cur
      System.gc()
      Thread.sleep(1500)
      cur = rddCount
      settleRounds += 1
    }
    val (endRdds, endStorage, endViews, endPending) =
      (rddCount, storageMb, views, pending)

    val maxRdds = sys.env.getOrElse("SOAK_MAX_RDDS", "24").toInt
    val maxStorageMb = sys.env.getOrElse("SOAK_MAX_STORAGE_MB", "1024").toLong
    val maxViews = sys.env.getOrElse("SOAK_MAX_VIEWS", "64").toLong
    val violations = Seq(
      (endRdds > maxRdds) -> s"persistent RDDs post-GC $endRdds > $maxRdds",
      (endStorage > maxStorageMb) -> s"storage post-GC ${endStorage}MB > ${maxStorageMb}MB",
      (endPending > graft.core.Caching.maxPending) ->
        s"pending listeners $endPending > cap ${graft.core.Caching.maxPending}",
      (endViews > maxViews) -> s"temp views $endViews > $maxViews",
    ).collect { case (true, msg) => msg }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val json =
      s"""{"n_queries":${queries.size},"n_errors":${errors.size},
         |"wall_sec":${d1(wall)},"sf":${jstr(sfDir)},
         |"peak_rdds":$peakRdds,"peak_storage_mb":$peakStorageMb,
         |"end_raw_rdds":$rawRdds,"end_raw_storage_mb":$rawStorage,
         |"end_postgc_rdds":$endRdds,"end_postgc_storage_mb":$endStorage,
         |"end_views":$endViews,"end_pending_listeners":$endPending,
         |"gc_settle_rounds":$settleRounds,
         |"bounds":{"max_rdds":$maxRdds,"max_storage_mb":$maxStorageMb,"max_views":$maxViews,"listener_cap":${graft.core.Caching.maxPending}},
         |"violations":[${violations.map(jstr).mkString(",")}],
         |"pass":${violations.isEmpty},
         |"errors":$errJson,
         |"trajectory":[
         |${rows.mkString(",\n")}
         |]}
         |""".stripMargin
    Option(Paths.get(outPath).getParent).foreach(Files.createDirectories(_))
    Files.writeString(Paths.get(outPath), json)
    println(s"[soak] ${queries.size} queries, ${errors.size} errors, " +
      s"wall ${d1(wall)}s; rdds peak=$peakRdds raw-end=$rawRdds " +
      s"post-gc=$endRdds; storage peak=${peakStorageMb}MB post-gc=${endStorage}MB; " +
      s"pending=$endPending views=$endViews -> " +
      (if (violations.isEmpty) "PASS" else s"FAIL: ${violations.mkString("; ")}"))
    spark.stop()
    if (violations.nonEmpty) sys.exit(1)
  }
}
