package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-adaptive partitioning helpers (optimization guide §2.5 "input
  * skew": one huge unsplittable file → repartition immediately after the
  * read).
  *
  * The bench corpora are single-file, single-ROW-GROUP parquet tables
  * (measured r14: lineitem sf0.1 = 600k rows in ONE row group), and a row
  * group is the parquet scan's atomic split unit — so every scan stage has
  * exactly one non-empty task no matter what `maxPartitionBytes` /
  * `openCostInBytes` say, and everything downstream of a `persist` or
  * `localCheckpoint` of that scan inherits the single-partition layout. On
  * a 32-core box that serializes the whole pipeline (q63 before: every job
  * in the chain ran 3 tasks with one doing all the work).
  *
  * [[spreadToCores]] makes the layout scale-ADAPTIVE instead of constant:
  * it round-robin-repartitions to the session's default parallelism ONLY
  * when the frame's current partitioning underfills it. At production
  * scale a 100 TB scan already yields thousands of row-group splits, the
  * guard is false, and no extra exchange is paid — the repartition fires
  * exactly in the regime where the input's file layout (not the data
  * volume) is what bounds parallelism. Round-robin keeps Spark's
  * sort-before-repartition determinism (SPARK-23207), so retried tasks
  * reproduce the same assignment.
  */
object Partitioning {

  /** `df` repartitioned to the session default parallelism when its
    * current partition count is below it; `df` unchanged otherwise. Call
    * on narrow/projected working sets ahead of a `persist`/multi-pass
    * consumption, never on a full-width table (project first — guide
    * §2.3). Deciding needs the frame's physical partitioning, which
    * `df.rdd` exposes without running a job. */
  def spreadToCores(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
