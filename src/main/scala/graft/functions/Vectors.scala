package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Embedding-similarity primitives (extension scope): cosine top-k and
  * sign-LSH approximate nearest neighbors over `array<float>` columns.
  *
  * All inner products run over fixed-point int64 components
  * (floor(x·1e6)): exact integer arithmetic makes dot products and norms
  * reproducible regardless of summation order, partitioning, or engine —
  * float accumulation would make top-k rankings flap between runs near
  * ties. 1e-6 quantization error is far below any meaningful similarity
  * resolution for unit-scale embeddings.
  */
object Vectors {

  import org.apache.spark.sql.graftbridge.Bridge.{toCol, toExpr}

  /** array<float> → array<bigint> fixed-point at 1e-6, as the codegen'd
    * [[graft.plans.QuantizeExpr]] kernel (the transform higher-order form
    * runs an interpreted lambda per dimension; DeterministicVectorsSpec
    * pins bit-equality). */
  def quantize(v: Column): Column =
    toCol(graft.plans.QuantizeExpr(toExpr(v)))

  /** Exact int64 dot product of two quantized vectors. Max magnitude for
    * unit-scale 64-dim embeddings: (1e6)^2 · 64 ≈ 2^46 — safe in long.
    * Runs the codegen'd [[graft.plans.QuantizedDot]] kernel — the
    * higher-order zip_with/aggregate form pays an interpreted lambda per
    * dimension per row. */
  def dotQ(a: Column, b: Column): Column =
    toCol(graft.plans.QuantizedDot(toExpr(a), toExpr(b)))

  /** Exact squared norm of a quantized vector. */
  def normSqQ(a: Column): Column = dotQ(a, a)

  /** Cosine from exact integer parts: double ops over identical exact
    * inputs → bit-deterministic. */
  def cosineFromParts(dot: Column, normSqA: Column, normSqB: Column): Column =
    dot.cast("double") / (sqrt(normSqA.cast("double")) * sqrt(normSqB.cast("double")))

  /** Exact squared L2 distance between quantized vectors (int64 — max
    * (2e6)²·64 ≈ 2.6e14, safe in long). Codegen'd kernel, see [[dotQ]]. */
  def l2SqQ(a: Column, b: Column): Column =
    toCol(graft.plans.QuantizedL2Sq(toExpr(a), toExpr(b)))

  /** Sign-LSH (random-hyperplane) bucket id over `nPlanes` deterministic
    * integer hyperplanes: plane p, dim d has component
    * (int64(md5("seed_p_d")[first 8 hex]) mod 2001) − 1000 — a fixed
    * md5-derived lattice, so bucketing is reproducible with no stored
    * model AND the planes are statistically independent (the property
    * [[adaptivePlanes]] scaling depends on — a correlated lattice leaves
    * candidate volume quadratic no matter the plane count; measured in
    * SCALE.md round 6 and [[graft.plans.SignLshBucketExpr]]'s scaladoc).
    * Bucket = Σ_p [dot(plane_p, v) ≥ 0]·2^p. (Charikar 2002 rounding
    * hyperplanes.)
    *
    * At scale this is the map side of ANN: one shuffle on bucket id
    * co-locates candidates; queries only scan their own bucket instead of
    * the full corpus. More planes → smaller buckets, lower recall.
    */
  def lshBucket(qv: Column, nPlanes: Int = 8): Column =
    toCol(graft.plans.SignLshBucketExpr(toExpr(qv), nPlanes))

  /** Sign-LSH bucket over an independent lattice per `seed` — the
    * multi-repetition form: R fine-grained bucketings whose candidate UNION
    * recovers the recall each single one loses to extra planes. This is the
    * hot-bucket control at corpus scale: per-bucket pair counts stay
    * bounded (more planes → exponentially smaller buckets) while repetition
    * keeps recall, and exact verification downstream means repetitions only
    * ever ADD true pairs. Seed 0 is [[lshBucket]]'s lattice. */
  def lshBucketSeeded(qv: Column, nPlanes: Int, seed: Int): Column =
    toCol(graft.plans.SignLshBucketExpr(toExpr(qv), nPlanes, seed))

  /** Plane count scaled to corpus size: ⌈log2(corpus / targetBucket)⌉
    * clamped to [8, 24] — expected bucket occupancy ≈ `targetBucket` under a
    * balanced hash, so per-bucket all-pairs work stays ~targetBucket² no
    * matter how the corpus grows. Pair with [[lshBucketSeeded]] repetitions
    * for recall. */
  def adaptivePlanes(corpusSize: Long, targetBucket: Int = 64): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, corpusSize.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(8, needed))
  }
}
