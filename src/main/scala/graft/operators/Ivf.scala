package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF coarse-quantizer training: sampled k-means++ seeding + distributed
  * Lloyd iterations, producing the small centroid model the IVF search
  * path (QueriesExt q42) broadcasts.
  *
  * The 100 TB shape is the MLlib KMeans shape, specialized to quantized
  * int64 embeddings and exact arithmetic:
  *  - seeding reads a BOUNDED deterministic sample (`TakeOrdered` by a
  *    seeded hash — O(n log s) per partition, no full sort, no shuffle of
  *    vector payloads beyond the sample) and runs k-means++ on the driver;
  *  - each Lloyd iteration is ONE distributed pass: nearest-centroid
  *    assignment via the codegen'd [[graft.plans.NearestCentroidExpr]]
  *    kernel (centroid matrix broadcast as a code reference, a pure map),
  *    then per-(centroid, dimension) integer sums through a map-side-
  *    combined aggregate — the shuffle carries k·d partials per partition,
  *    independent of corpus size;
  *  - all accumulation is exact int64 (sums of quantized components), so
  *    training is bit-deterministic for a given (input set, k, iters,
  *    seed) regardless of partitioning or execution order.
  *
  * The model stays in the quantized domain ([[graft.functions.Vectors
  * .quantize]]'s 1e-6 fixed point): centroid components are floor-divided
  * means, comparable with vectors by the same integer kernels.
  */
object Ivf {

  /** A trained coarse quantizer: row i is centroid id i. */
  final case class Model(centroids: Array[Array[Long]]) {
    def k: Int = centroids.length
    require(centroids.nonEmpty, "model needs at least one centroid")
  }

  /** Nearest-centroid id (0-based, ties to the lower id) as a codegen'd
    * per-row map over the broadcast model — the IVF list assignment. */
  def assign(vec: Column, model: Model): Column = {
    import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}
    toCol(graft.plans.NearestCentroidExpr(toExpr(vec), model.centroids))
  }

  /** Train a k-centroid coarse quantizer over a quantized embedding column.
    *
    * @param emb        input frame; `vecCol` must be `array<bigint>`
    *                   (quantized) with non-null, equal-length vectors
    * @param vecCol     embedding column name
    * @param k          centroid count (IVF list count)
    * @param iters      Lloyd iterations over the full input (each is one
    *                   distributed pass; the cost knob at scale)
    * @param seed       drives both the seeding sample and k-means++
    * @param sampleSize driver-collected seeding sample bound (vectors)
    */
  def train(emb: DataFrame, vecCol: String, k: Int, iters: Int = 5,
      seed: Long = 42L, sampleSize: Int = 65536): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // Bounded deterministic sample: top-s by seeded hash of the vector
    // itself (content-addressed, so the sample is partition-invariant).
    val sample: Array[Array[Long]] = emb
      .select(col(vecCol).as("v"))
      .orderBy(xxhash64(col("v"), lit(seed)))
      .limit(math.max(k, sampleSize))
      .collect()
      .map(_.getSeq[Long](0).toArray)
    require(sample.length >= k,
      s"need at least k=$k vectors to seed, corpus has ${sample.length}")
    // fail fast on ragged input (the documented equal-length precondition):
    // unchecked, a long vector would AIOOBE mid-Lloyd via posexplode while
    // a short one would silently train on a truncated prefix
    val dim = sample.head.length
    require(sample.forall(_.length == dim),
      s"ragged embedding lengths in the seeding sample (expected $dim) — " +
        "vectors must be equal-length")

    var cents = seedPlusPlus(sample, k, seed)
    var it = 0
    while (it < iters) {
      cents = lloydStep(emb, vecCol, cents)
      it += 1
    }
    Model(cents)
  }

  /** k-means++ (Arthur & Vassilvitskii 2007) on the driver-side sample:
    * first centroid by seeded pick, each next with probability ∝ D² to the
    * nearest chosen centroid. Exact integer D²; the only randomness is the
    * seeded generator. */
  private def seedPlusPlus(sample: Array[Array[Long]], k: Int,
      seed: Long): Array[Array[Long]] = {
    val rnd = new scala.util.Random(seed)
    val chosen = new Array[Array[Long]](k)
    chosen(0) = sample(rnd.nextInt(sample.length))
    // running D² to the nearest chosen centroid
    val d2 = sample.map(v => l2sq(v, chosen(0)))
    var c = 1
    while (c < k) {
      val total = d2.map(BigInt(_)).sum
      val next =
        if (total == 0) rnd.nextInt(sample.length) // all mass on chosen points
        else {
          // draw in [0, total) with BigInt precision, walk the cumulative sum
          var r = BigInt(total.bitLength + 64, rnd) mod total
          var i = 0
          while (r >= d2(i)) { r -= d2(i); i += 1 }
          i
        }
      chosen(c) = sample(next)
      var i = 0
      while (i < sample.length) {
        val d = l2sq(sample(i), chosen(c))
        if (d < d2(i)) d2(i) = d
        i += 1
      }
      c += 1
    }
    chosen
  }

  /** One distributed Lloyd iteration: assign (pure map, broadcast model) →
    * per-(cid, dim) integer sums (map-side combined; k·d rows reach the
    * driver) → floor-divided means. Empty clusters keep their centroid. */
  private def lloydStep(emb: DataFrame, vecCol: String,
      cents: Array[Array[Long]]): Array[Array[Long]] = {
    val model = Model(cents)
    val stats = emb
      .select(assign(col(vecCol), model).as("cid"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
      .collect()
    val next = cents.map(_.clone())
    stats.foreach { r =>
      val cid = r.getInt(0)
      val pos = r.getInt(1)
      next(cid)(pos) = Math.floorDiv(r.getLong(2), r.getLong(3))
    }
    next
  }

  private def l2sq(a: Array[Long], b: Array[Long]): Long = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) { val d = a(i) - b(i); acc += d * d; i += 1 }
    acc
  }
}
