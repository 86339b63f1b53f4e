package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-means trainer for the IVF coarse quantizer: recovers known cluster
  * structure, deterministically, in the exact quantized domain. */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  // 4 well-separated true centers in 8-dim quantized space (1e6 = 1.0),
  // 60 points each with small deterministic jitter
  private val trueCenters: Seq[Array[Long]] = Seq(
    Array.fill(8)(1000000L),
    Array.fill(8)(-1000000L),
    Array.tabulate(8)(d => if (d % 2 == 0) 1000000L else -1000000L),
    Array.fill(8)(0L))

  private def corpus = {
    val rows = for {
      (c, ci) <- trueCenters.zipWithIndex
      j <- 0 until 60
    } yield (ci.toLong * 60 + j, ci,
      c.zipWithIndex.map { case (x, d) => x + ((j * 31 + d * 7) % 2001) - 1000 }.toSeq)
    rows.toDF("vec_id", "true_cid", "qv")
  }

  test("train recovers the true centers and assignment is pure") {
    val df = corpus.cache()
    val model = Ivf.train(df, "qv", k = 4, iters = 5, seed = 7L)
    assert(model.k == 4)
    // every trained centroid sits close to a DISTINCT true center
    // (jitter is ±1000 per dim → any true-center pair is ≥ 1e6 apart
    // per differing dim; tolerance 5000 per dim is generous)
    def l2sq(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val matches = model.centroids.map { cent =>
      trueCenters.zipWithIndex.minBy { case (tc, _) => l2sq(cent, tc) }
    }
    assert(matches.map(_._2).distinct.length == 4,
      "trained centroids did not split across the 4 true centers")
    matches.foreach { case (tc, _) =>
      val cent = model.centroids.minBy(l2sq(_, tc))
      assert(l2sq(cent, tc) < 8L * 5000 * 5000,
        "trained centroid too far from its true center")
    }
    // assignment: every point lands with the other points of its true
    // cluster (purity 1.0 on well-separated clusters)
    val assigned = df.select(col("true_cid"),
      Ivf.assign(col("qv"), model).as("cid"))
      .groupBy("true_cid").agg(countDistinct("cid").as("n"))
      .collect()
    assert(assigned.forall(_.getLong(1) == 1), "a true cluster was split")
  }

  test("training is deterministic across repartitionings") {
    val a = Ivf.train(corpus.repartition(3), "qv", k = 4, iters = 3, seed = 11L)
    val b = Ivf.train(corpus.repartition(17), "qv", k = 4, iters = 3, seed = 11L)
    assert(a.centroids.map(_.toSeq).toSeq == b.centroids.map(_.toSeq).toSeq)
  }

  test("assign breaks ties to the lower centroid id and needs no exchange") {
    val model = Ivf.Model(Array(Array(0L, 0L), Array(0L, 0L), Array(5L, 5L)))
    val df = Seq(Seq(1L, 1L), Seq(4L, 4L)).toDF("qv")
      .select(Ivf.assign(col("qv"), model).as("cid"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 2))
    // pure map: no exchange anywhere in the assignment plan
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
