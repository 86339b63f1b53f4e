package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A2 recursive evaluation-tree rollup (SURVEY §2.5) — the reference's
  * `calculate_scores_recursively` (dags/score/etl_scores_by_subject_to_clickhouse.py:63-81):
  * a node's value is the mean of its children's values; a childless node's
  * value is the mean of its own raw scores.
  *
  * The reference recurses per-node in Python. Distributed form: a leaf-up
  * iterative fixpoint of (join children→resolved parents, aggregate). Each
  * round resolves every node whose children are all resolved, so the number
  * of rounds equals tree height (≤ 4 in the reference: custom → subject →
  * month → semester), independent of data volume — the driver loop is
  * bounded by the schema of the hierarchy, not by row count, and each round
  * is a full-cluster shuffle-aggregate. `localCheckpoint` truncates lineage
  * so plans don't grow with depth.
  */
object TreeRollup {

  /** @param nodes  (id, parentId) adjacency; parentId null/'na' = root edge ignored
    * @param leafScores (id, score) raw per-node observations (nulls already
    *                   handled by the caller per-pipeline: the reference has
    *                   three different null semantics, SURVEY §1.2)
    * @return (id, value, height) — every node's rolled-up value; height 0 =
    *         computed from own scores, else max child round + 1
    */
  def rollup(nodes: DataFrame, leafScores: DataFrame, maxDepth: Int = 20): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._

    val edges = nodes.select($"id", $"parentId")
      .filter($"parentId".isNotNull && $"parentId" =!= "na")
    val parentsWithChildren = edges.select($"parentId".as("id")).distinct()

    // Round 0: childless nodes average their own raw scores.
    var resolved = leafScores.groupBy($"id")
      .agg(avg($"score").as("value"))
      .join(parentsWithChildren, Seq("id"), "left_anti")
      .withColumn("height", lit(0))
      .localCheckpoint()

    val childCounts = edges.groupBy($"parentId").agg(count("*").as("n_children"))

    var resolvedNew = resolved
    var depth = 0
    while (depth < maxDepth && !resolvedNew.isEmpty) {
      depth += 1
      // Parents all of whose children are resolved, not themselves resolved yet.
      val candidate = edges
        .join(resolved.withColumnRenamed("id", "childId"),
          edges("id") === col("childId"))
        .groupBy($"parentId")
        .agg(avg($"value").as("value"), count("*").as("n_resolved"),
          (max($"height") + 1).as("height"))
        .join(childCounts, Seq("parentId"))
        .filter($"n_resolved" === $"n_children")
        .select($"parentId".as("id"), $"value", $"height")
      resolvedNew = candidate
        .join(resolved.select($"id"), Seq("id"), "left_anti")
        .localCheckpoint()
      if (!resolvedNew.isEmpty)
        resolved = resolved.unionByName(resolvedNew).localCheckpoint()
    }
    resolved
  }
}
