package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

/** Dev tool for the optimization rounds: time a LIST of named queries in one
  * JVM and dump each one's formatted physical plan to a file — the
  * before/after exhibits in plans/rNN/. Reuses one warmed session so the
  * timings reflect steady-state execution, not per-JVM classloading.
  *
  * `runMain graft.OptProbe <q1,q2,...|top:N> <planDir> [suffix] [sfDir] [reps]`
  * e.g. `runMain graft.OptProbe q63_window_ranks,q138_heavy_hitters
  *       /root/repo/plans/r14 before`
  */
/** Prints every job's wall time + stage/task counts when SPARK_GRAFT_JOBS=1:
  * the decomposition that says WHERE a multi-action query spends its time
  * (probe jobs vs the main write) without the (disabled) UI. */
private[graft] final class JobTimeListener
    extends org.apache.spark.scheduler.SparkListener {
  private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
  @volatile var enabled = false
  override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
    starts.put(e.jobId, (System.nanoTime(),
      s"${e.stageInfos.size} stages/${e.stageInfos.map(_.numTasks).sum} tasks " +
        Option(e.properties).flatMap(p =>
          Option(p.getProperty("spark.job.description"))).getOrElse("")))
  override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
    val s = starts.remove(e.jobId)
    if (enabled && s != null) {
      val dt = (System.nanoTime() - s._1) / 1e9
      if (dt >= 0.02)
        println(f"[job] ${e.jobId}%5d ${dt}%7.3f s  ${s._2.take(120)}")
    }
  }
}

object OptProbe {
  /** SPARK_GRAFT_SAMPLE=1: sample every thread's top-of-stack ~every 50 ms
    * and print a frame histogram at exit — a poor man's profiler for time
    * that never reaches a Spark job (driver-side planning, streaming
    * machinery). Dev diagnostics only. */
  private def startSampler(): java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong] = {
    val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]
    val t = new Thread(() => {
      while (true) {
        Thread.sleep(50)
        val traces = Thread.getAllStackTraces
        traces.forEach { (th, st) =>
          if (th.getState == Thread.State.RUNNABLE && st.nonEmpty &&
              !th.getName.contains("sampler")) {
            val top = st.slice(8, 20).map(f => s"${f.getClassName}.${f.getMethodName}")
              .mkString(" < ")
            hist.computeIfAbsent(s"[${th.getName.take(40)}] $top",
              _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
          }
        }
      }
    }, "graft-sampler")
    t.setDaemon(true)
    t.start()
    hist
  }

  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val planDir = Paths.get(args(1))
    val suffix = if (args.length > 2) args(2) else "before"
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val reps = if (args.length > 4) args(4).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    Files.createDirectories(planDir)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new JobTimeListener
    if (sys.env.get("SPARK_GRAFT_JOBS").exists(v => v.nonEmpty && v != "0"))
      spark.sparkContext.addSparkListener(jobs)
    val sampler = if (sys.env.get("SPARK_GRAFT_SAMPLE")
        .exists(v => v.nonEmpty && v != "0")) Some(startSampler()) else None
    val all = SparkEntry.queries
    val missing = names.filterNot(all.contains)
    require(missing.isEmpty, s"unknown queries: ${missing.mkString(",")}")
    // warmup at the smallest SF so codegen/classloading is off the clock
    names.foreach { n =>
      try all(n)(spark, "/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    names.foreach { n =>
      val fn = all(n)
      val qNo = n.takeWhile(_ != '_')
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(planDir.resolve(s"${qNo}_$suffix.txt"),
        plan.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      spark.sparkContext.setJobDescription(s"optprobe:$n")
      val times = (1 to reps).map { i =>
        jobs.enabled = i == reps // job breakdown for the last (warm) rep only
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        jobs.enabled = false
        spark.catalog.clearCache()
        dt
      }.sorted
      val med = times(times.size / 2)
      println(f"[optprobe] $n%-32s median=$med%.3f s  (${times.map(t => f"$t%.3f").mkString(", ")})")
    }
    sampler.foreach { hist =>
      val rows = new java.util.ArrayList(hist.entrySet())
      rows.sort((a, b) => java.lang.Long.compare(b.getValue.get, a.getValue.get))
      rows.forEach { e =>
        if (e.getValue.get >= 5)
          println(f"[sample] ${e.getValue.get}%6d  ${e.getKey.take(600)}")
      }
    }
    spark.stop()
  }
}
