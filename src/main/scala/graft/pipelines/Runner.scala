package graft.pipelines

import graft.sources.{Sinks, WatermarkStore}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Incremental-pipeline runner: the reference's Airflow task chain
  * `extract >> load >> update_timestamp`
  * (dags/student/etl_students_to_clickhouse.py:143-149) as function
  * composition around [[WatermarkStore]].
  *
  * Ordering is the correctness property (§2.10): the watermark commits only
  * AFTER a successful load, so a failed run re-reads the same window —
  * at-least-once, with replay duplicates resolved at read time by
  * `Relational.dedupLatest`. The new watermark is the max `updatedAt`
  * actually LOADED (not wall-clock "now" as the reference uses): clock skew
  * between extractor and source can never drop rows this way.
  */
object Runner {

  val Epoch: java.sql.Timestamp = java.sql.Timestamp.valueOf("1970-01-01 00:00:00")

  def watermarkOf(store: WatermarkStore, pipeline: String): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(
      store.get(pipeline, "1970-01-01T00:00:00").replace('T', ' '))

  /** Run one incremental pipeline: transform from the stored watermark,
    * append-write partitioned+clustered, then commit the max timestamp seen.
    *
    * SINGLE pass over the source: the row count and max timestamp ride the
    * write itself as `observe` metrics (accumulator-backed, collected by
    * the write job), instead of a separate stats aggregation that would
    * execute the whole transform twice — at 100 TB a doubled (and
    * non-atomic: the source can advance between passes) full scan. The
    * empty-batch guard is the observed count, so the sink's `isEmpty`
    * probe is skipped too; an empty append leaves only a _SUCCESS marker.
    * Commit ordering is unchanged: the watermark is written only after the
    * load succeeded, from timestamps actually loaded.
    *
    * @param transform watermark => output DataFrame (must retain `tsCol`)
    * @return rows loaded
    */
  def runIncremental(
      store: WatermarkStore, pipeline: String, tsCol: String,
      outPath: String, partitionCols: Seq[String], sortCols: Seq[String])(
      transform: java.sql.Timestamp => DataFrame): Long = {
    val wm = watermarkOf(store, pipeline)
    val obs = org.apache.spark.sql.Observation()
    val out = transform(wm)
      .observe(obs, count(lit(1)).as("n"), max(col(tsCol)).as("max_ts"))
    Sinks.writePartitioned(out, outPath, partitionCols, sortCols,
      SaveMode.Append, guardEmpty = false)
    val stats = obs.get
    val n = stats("n").asInstanceOf[Long]
    if (n > 0) {
      val newWm = stats("max_ts").asInstanceOf[java.sql.Timestamp]
      store.set(pipeline, newWm.toString.replace(' ', 'T').takeWhile(_ != '.'))
    }
    n
  }

  /** Idempotent logical-date backfill — Airflow's `backfill`/`catchup`
    * semantic without the scheduler. Re-materializes exactly the requested
    * partitions in ONE pass (a per-date loop would pay N source scans at
    * 100 TB): the requested partition directories are dropped first, then
    * the recomputed rows append into them — so EVERY requested date is
    * replaced, including one whose recomputation is now EMPTY (upstream
    * retraction), which dynamic partition overwrite would silently leave
    * stale. Untouched dates are never affected, rerunning is idempotent by
    * construction, and no session conf is mutated (a session-global
    * overwrite-mode flip would race concurrent writers). The delete-then-
    * write pair is not atomic — a failure in between leaves the requested
    * dates empty until the rerun, the standard at-least-once backfill
    * contract (the watermark Runner's write-then-commit discipline applied
    * to partitions).
    *
    * The output is filtered to the requested dates before writing: a
    * transform that accidentally emits other dates must not clobber them —
    * the partition set touched is part of the CONTRACT, not of whatever
    * the transform happened to produce.
    *
    * @param transform dates => output rows carrying `dateCol`
    * @return rows written across the backfilled partitions */
  def backfill(dates: Seq[java.sql.Date], dateCol: String, outPath: String,
      sortCols: Seq[String] = Nil)(
      transform: Seq[java.sql.Date] => DataFrame): Long = {
    require(dates.nonEmpty, "backfill needs at least one logical date")
    val out = transform(dates)
      .filter(col(dateCol).isin(dates.map(lit(_)): _*))
    val spark = out.sparkSession
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dates.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$outPath/$dateCol=$d"), true)
    }
    val obs = org.apache.spark.sql.Observation()
    Sinks.writePartitioned(
      out.observe(obs, count(lit(1)).as("n")),
      outPath, Seq(dateCol), sortCols, SaveMode.Append,
      guardEmpty = false)
    obs.get("n").asInstanceOf[Long]
  }
}
