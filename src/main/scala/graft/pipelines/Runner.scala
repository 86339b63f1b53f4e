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
    * @param transform watermark => output DataFrame (must retain `tsCol`)
    * @return rows loaded
    */
  def runIncremental(
      store: WatermarkStore, pipeline: String, tsCol: String,
      outPath: String, partitionCols: Seq[String], sortCols: Seq[String])(
      transform: java.sql.Timestamp => DataFrame): Long = {
    val wm = watermarkOf(store, pipeline)
    val out = transform(wm)
    // one pass: stats + write (count is cheap relative to the write; at
    // cluster scale swap for write-metrics listeners)
    val stats = out.agg(count(lit(1)), max(col(tsCol))).collect().head
    val n = stats.getLong(0)
    if (n > 0) {
      Sinks.writePartitioned(out, outPath, partitionCols, sortCols, SaveMode.Append)
      val newWm = stats.getTimestamp(1)
      store.set(pipeline, newWm.toString.replace(' ', 'T').takeWhile(_ != '.'))
    }
    n
  }
}
