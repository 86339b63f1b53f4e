package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches (Cormode & Muthukrishnan's count-min) for
  * the regime where the key universe itself doesn't fit anywhere: the
  * sketch is d×w counters regardless of cardinality, counters are purely
  * ADDITIVE (map-side combinable, mergeable across days/streams/shards),
  * and estimates are one-sided (est ≥ true count, the classic CMS
  * guarantee).
  *
  * Lane hashes are md5-derived from the key's string form (the
  * [[Sampling]] stable-hash discipline), so the sketch is a pure function
  * of the key MULTISET — partition-invariant and reproducible by any
  * engine that can md5 a string, which is what makes q95's independent
  * DuckDB rebuild meaningful.
  *
  * Encoding contract (SURVEY §2.13): [[countMinInnerProduct]]'s
  * DECIMAL(38,0) estimate is for internal exact arithmetic — final
  * projections shipping to the correctness gate render it as a string.
  */
object Sketch {

  /** One namespaced 32-hex md5 per row; each lane reads its own disjoint
    * 8-hex (32-bit) slice. ONE hash evaluation serves all d lanes — at
    * sketch-build and probe time the md5 dominates the per-row cost, so
    * this is a ~d× kernel saving over hashing "lane:key" per lane. Lane
    * slices of one md5 are independent for CMS purposes (md5 diffusion);
    * the one-sided est ≥ true guarantee needs no independence at all.
    * Caps d at 4 (4 slices × 8 hex = the whole digest). */
  private def keyHash(key: Column): Column =
    md5(concat(lit("c:"), key.cast("string")))

  /** Lane-r bucket from a precomputed [[keyHash]] column: slice r's 8 hex
    * chars, mod w. */
  private def sliceBucket(h: Column, lane: Int, w: Int): Column =
    pmod(conv(substring(h, 1 + 8 * lane, 8), 16, 10).cast("long"), lit(w))

  private val MaxLanes = 4

  /** Legacy lane-hash bucket ("lane:key" md5) — used by the DISTINCT
    * sketches ([[distinctMin]]/[[distinctMinPerKey]]), whose bucket lane
    * must stay independent of their "v:key" VALUE lane and whose q96/q109
    * oracles pin this exact construction. The CMS family uses the sliced
    * [[keyHash]] instead (one md5 serves all lanes). */
  private def laneBucket(lane: Column, key: Column, w: Int): Column =
    pmod(conv(substring(md5(concat(lane, lit(":"), key.cast("string"))), 1, 8),
      16, 10).cast("long"), lit(w))

  /** Build the sketch: one generator fans each row into its d lanes, one
    * map-side-combinable aggregate sums the cells. At most d·w output
    * rows no matter the input size.
    *
    * @return (lane, bucket, cnt) — only nonzero cells */
  def countMin(df: DataFrame, keyCol: String, w: Int, d: Int): DataFrame = {
    require(w >= 2 && d >= 1 && d <= MaxLanes,
      s"countMin needs w >= 2, 1 <= d <= $MaxLanes; got w=$w d=$d")
    df.select(keyHash(col(keyCol)).as("gf_h"))
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("lane"),
          sliceBucket(col("gf_h"), r, w).as("bucket"))): _*)).as("lb"))
      .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** [[countMin]] built from an ALREADY-AGGREGATED (key, weight) table —
    * cell values are weight sums, so the sketch is identical to running
    * [[countMin]] over the raw rows (Σ over keys in a bucket of the key's
    * count) but the generator fans out over |keys| rows instead of |rows|:
    * when a per-key count table already exists (it is the inherent first
    * aggregate of join-size/skew statistics), the sketch costs O(keys·d),
    * not another corpus scan. */
  def countMinWeighted(counts: DataFrame, keyCol: String, weightCol: String,
      w: Int, d: Int): DataFrame = {
    require(w >= 2 && d >= 1 && d <= MaxLanes,
      s"countMinWeighted needs w >= 2, 1 <= d <= $MaxLanes; got w=$w d=$d")
    counts.select(col(weightCol).as("__w"), keyHash(col(keyCol)).as("gf_h"))
      .select(col("__w"), explode(array((0 until d).map(r =>
          struct(lit(r).as("lane"),
            sliceBucket(col("gf_h"), r, w).as("bucket"))): _*)).as("lb"))
      .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      .agg(sum(col("__w")).as("cnt"))
  }

  /** Point estimates for a set of probe keys: min over the d probed cells
    * (absent cell = 0). The sketch side is d·w rows — broadcast-sized by
    * construction — so probing any number of keys is one broadcast join. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      w: Int, d: Int): DataFrame = {
    require(d >= 1 && d <= MaxLanes,
      s"countMinEstimate needs 1 <= d <= $MaxLanes, got d=$d")
    val keyed = probes.select(col(keyCol), keyHash(col(keyCol)).as("gf_h"))
      .select(col(keyCol), explode(array((0 until d).map(r =>
        struct(lit(r).as("lane"),
          sliceBucket(col("gf_h"), r, w).as("bucket"))): _*)).as("lb"))
      .select(col(keyCol), col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
    keyed.join(broadcast(sketch), Seq("lane", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Equi-join cardinality estimate from two [[countMin]] sketches built
    * with the SAME (w, d): |A ⋈ B on key| = Σ_key cntA·cntB, over-
    * approximated (one-sided, like the point estimate) by the min over
    * lanes of the bucketwise product sum — the classic CMS inner product,
    * and the query-optimizer primitive for sizing a join without running
    * it. Cost: d·w-row frames only; the data was touched once when the
    * sketches were built. Products run in DECIMAL(38,0): two 10¹²-row
    * inputs through a narrow sketch overflow int64.
    *
    * @return one row (est: decimal(38,0)) */
  def countMinInnerProduct(a: DataFrame, b: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val prod = a.select(col("lane"), col("bucket"), col("cnt").as("cnt_a"))
      .join(b.select(col("lane"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("lane", "bucket")) // inner: a cell missing on either side is 0
      .groupBy(col("lane"))
      .agg(sum((col("cnt_a").cast(d38) * col("cnt_b")).cast(d38)).as("p"))
    // a lane with NO overlapping buckets has true product 0 and must WIN
    // the min (disjoint key sets ⇒ est 0) — the inner join erased it, so
    // reattach every lane either sketch carries; both sketches empty ⇒ 0
    val lanes = a.select(col("lane")).unionByName(b.select(col("lane")))
      .distinct()
    lanes.join(prod, Seq("lane"), "left")
      .agg(coalesce(min(coalesce(col("p"), lit(0).cast(d38))),
        lit(0).cast(d38)).cast(d38).as("est"))
  }

  /** Distinct-cardinality min-sketch (Flajolet-Martin stochastic averaging
    * over the min-value estimator): k buckets keyed by one md5 lane, each
    * keeping the MIN of an INDEPENDENT md5 value lane. `min` is
    * idempotent-combinable, so the sketch is map-side combinable, mergeable
    * across shards by cellwise min, and at most k rows regardless of input
    * size — the scale path next to q94's exact `countDistinct` (whose
    * shuffle carries the full distinct-value set). Higher variance than
    * KMV/HLL per cell, but every number here is exact integer arithmetic,
    * which is what lets DuckDB rebuild the identical sketch.
    *
    * @return (bucket, minh) — only nonempty buckets */
  def distinctMin(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"distinctMin needs k >= 2, got $k")
    df.select(
        laneBucket(lit("b"), col(keyCol), k).as("bucket"),
        conv(substring(md5(concat(lit("v:"), col(keyCol).cast("string"))), 1, 8),
          16, 10).cast("long").as("h"))
      .groupBy("bucket").agg(min(col("h")).as("minh"))
  }

  /** Per-group [[distinctMin]]: one k-bucket min-sketch per `keyCol`
    * value — ≤ k rows of state per group no matter how many distinct
    * `valCol` values the group holds, all min-combinable. The bounded-
    * state alternative to an exact per-group `countDistinct`, whose
    * shuffle carries every distinct value.
    *
    * @return (keyCol, bucket, minh) */
  def distinctMinPerKey(df: DataFrame, keyCol: String, valCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"distinctMinPerKey needs k >= 2, got $k")
    df.select(col(keyCol),
        laneBucket(lit("b"), col(valCol), k).as("bucket"),
        conv(substring(md5(concat(lit("v:"), col(valCol).cast("string"))), 1, 8),
          16, 10).cast("long").as("h"))
      .groupBy(col(keyCol), col("bucket")).agg(min(col("h")).as("minh"))
  }

  /** Per-group cardinality estimates from a [[distinctMinPerKey]] sketch —
    * the [[distinctEstimate]] harmonic combiner applied within each key.
    *
    * @return (keyCol, est) */
  def distinctEstimatePerKey(sketch: DataFrame, keyCol: String,
      k: Int): DataFrame = {
    require(k >= 2 && k <= 40000, s"needs 2 <= k <= 40000, got $k")
    sketch.groupBy(col(keyCol))
      .agg(expr(s"CAST(${k.toLong * k} * 4294967296 DIV " +
        s"(coalesce(sum(minh + 1), 0) + ($k - count(1)) * 4294967296) - $k " +
        "AS BIGINT)").as("est"))
  }

  /** Bottom-k (KMV, k-minimum-values) distinct-value sketch (Bar-Yossef
    * et al. 2002): the k smallest DISTINCT 32-bit md5 hash values of the
    * key set. Unlike [[distinctMin]]/[[hllRegisters]], a KMV sketch
    * supports SET OPERATIONS ([[kmvSetOps]]): because every engine
    * hashing the same key produces the same h, two sketches share
    * exactly the hashes their key sets share — the Theta-sketch
    * workflow (estimate |A∪B|, |A∩B|, Jaccard between segments without
    * ever co-shuffling the raw sets). Mergeable: k smallest of the
    * union of two sketches ≡ the sketch of the union. The global
    * order-limit compiles to TakeOrdered — per-partition bounded heaps,
    * then a k-row merge on the driver side of the exchange; state is
    * ≤ k rows no matter the input.
    *
    * @return single column (h: long), the k smallest distinct hashes */
  def kmv(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    df.select(
        conv(substring(md5(concat(lit("v:"), col(keyCol).cast("string"))), 1, 8),
          16, 10).cast("long").as("h"))
      .distinct().orderBy(col("h")).limit(k)
  }

  /** Set-operation estimates from two [[kmv]] sketches built with the
    * same k (contract: pass MATERIALIZED sketches — each side is read
    * twice, for the union re-sketch and the membership flags, and both
    * are ≤ k rows). The union sketch u = k smallest of a ∪ b is itself
    * a valid KMV sketch of A∪B; with o = |{h ∈ u : h ∈ a ∧ h ∈ b}|:
    *
    *   union_est   = (k−1)·2³² DIV (h_k + 1)   (the KMV unbiased
    *                 estimator; +1 dodges h=0 and biases by < 2⁻³²),
    *                 or exactly |u| when the sketch is under-full
    *                 (m < k ⇒ u holds EVERY union hash)
    *   jaccard_micro = 10⁶·o DIV m             (o/m is the standard
    *                 KMV Jaccard estimator over the union sample)
    *   inter_est   = o·union_est DIV m
    *
    * All-integer arithmetic throughout (the engine-wide rational
    * discipline) — every operand non-negative, so truncating DIV ≡
    * floor division across engines. The membership joins broadcast
    * ≤ k-row sides.
    *
    * @return one row (union_est, inter_est, jaccard_micro) */
  def kmvSetOps(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"kmvSetOps needs k >= 2, got $k")
    val u = a.unionByName(b).distinct().orderBy(col("h")).limit(k)
    u.join(broadcast(a.withColumn("in_a", lit(1))), Seq("h"), "left")
      .join(broadcast(b.withColumn("in_b", lit(1))), Seq("h"), "left")
      .agg(count(lit(1)).as("m"), max(col("h")).as("kth"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1).otherwise(0))
          .as("o"))
      .select(
        expr(s"CAST(CASE WHEN m < $k THEN m" +
          s" ELSE ${k - 1} * 4294967296 DIV (kth + 1) END AS BIGINT)")
          .as("union_est"),
        col("m"), col("o"))
      .select(
        col("union_est"),
        expr("CAST(o * union_est DIV m AS BIGINT)").as("inter_est"),
        expr("CAST(1000000 * o DIV m AS BIGINT)").as("jaccard_micro"))
  }

  /** Exact heavy hitters via a count-min pre-filter (the ClickHouse
    * `topK`/`anyHeavy` workflow, made exact): all keys whose frequency
    * is at least T = N DIV s. Two passes over the input, neither of
    * which shuffles the full key set:
    *
    *   1. build the d×w [[countMin]] sketch (bounded additive state) and
    *      collect it — a ≤ d·w-cell model, the Ivf/BloomPrune
    *      bounded-model pattern; N itself is read off lane 0's cell sums,
    *      costing no extra scan;
    *   2. re-scan, estimating each row's key frequency with a pure
    *      codegen'd expression over the collected cell array (min over
    *      the d lanes, a flat `element_at` per lane — no explode, no
    *      join, no shuffle) and keep rows with est ≥ T. The CMS
    *      one-sided guarantee (est ≥ true count) makes the surviving key
    *      set a PROVABLE SUPERSET of the true heavy hitters, so the
    *      exact recount over the survivors returns exactly
    *      {key : count ≥ T} — the sketch only prunes; the answer is
    *      exact, and the oracle needs no sketch at all.
    *
    * The recount groupBy shuffles only candidate-key rows — at a skewed
    * 100 TB input that is the point: the long uniform tail is rejected
    * map-side by the estimate filter and never reaches an exchange.
    *
    * @return (keyCol, cnt) — exactly the keys with count ≥ N DIV s */
  def heavyHitters(df: DataFrame, keyCol: String, s: Long,
      w: Int = 2048, d: Int = 4): DataFrame = {
    require(s >= 2, s"heavyHitters needs s >= 2, got $s")
    require(d >= 1 && d <= MaxLanes,
      s"heavyHitters needs 1 <= d <= $MaxLanes, got d=$d")
    // Lane hash: xxhash64 seeded per lane, NOT countMin's md5 slice. The
    // md5 contract exists so q95/q105/q119 can rebuild the PUBLISHED
    // sketch cells cross-engine; here the sketch is a private pre-filter
    // (only the exact recount leaves the operator — the result is
    // hash-invariant by the one-sided superset argument below), and the
    // md5 path pays a hex-string render + substring + string→decimal conv
    // per row where xxhash64 is one codegen-native long op (measured r14:
    // the two md5 scan stages were 1.4 s + 2.0 s of the query's 4.0 s).
    def bucket(r: Int): Column =
      pmod(xxhash64(lit(r), col(keyCol).cast("string")), lit(w))
    val cells = df
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("lane"), bucket(r).as("bucket"))): _*)).as("lb"))
      .groupBy(col("lb.lane").as("lane"), col("lb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
    val arr = Array.fill(d * w)(0L)
    cells.foreach { r =>
      arr(r.getAs[Int]("lane") * w + r.getAs[Long]("bucket").toInt) =
        r.getAs[Long]("cnt")
    }
    val n = arr.slice(0, w).sum // lane 0 holds every row exactly once
    val thr = n / s
    val cellArr = typedLit(arr.toSeq)
    val est = (0 until d).map { r =>
      element_at(cellArr, (bucket(r) + lit(r * w) + lit(1)).cast("int"))
    }.reduceLeft(least(_, _))
    // The estimate is a pure function of the key, so the row filter IS
    // the candidate-key membership test — every row of a surviving key
    // passes. Recount directly on the filtered rows: no distinct pass,
    // no semi-join, one sketch scan + one filtered recount scan total.
    df.filter(est >= lit(thr))
      .groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= thr)
  }

  /** HyperLogLog register table (Flajolet, Fusy, Gandouet & Meunier
    * 2007): m registers keyed by the TOP log₂(m) bits of a 32-bit md5
    * lane, each keeping the MAX rank (leading-zero count + 1) of the
    * remaining 32−log₂(m) bits. `max` is idempotent-combinable, so the
    * sketch is map-side combinable and mergeable across shards/days by
    * cellwise max at ≤ m rows of state — the industry-standard
    * distinct-count sketch (ClickHouse's `uniq` family, Spark's own
    * `approx_count_distinct`) next to [[distinctMin]]'s min-value
    * estimator; HLL's max-rank register is 5 bits of state where the min
    * sketch keeps a 32-bit hash, and its relative error is the tighter
    * 1.04/√m. The rank is derived with INTEGER arithmetic only
    * (`bit_length` via `bin()` string length, not a float log₂, which
    * rounds differently across engines at exact powers of two).
    *
    * @param m register count, a power of two in [16, 65536]
    * @return (reg, r) — only registers at least one key hashed into */
  def hllRegisters(df: DataFrame, keyCol: String, m: Int): DataFrame = {
    require(m >= 16 && m <= 65536 && (m & (m - 1)) == 0,
      s"hllRegisters needs a power-of-two m in [16, 65536], got $m")
    val remBits = 32 - Integer.numberOfTrailingZeros(m)
    val h = conv(substring(md5(concat(lit("v:"), col(keyCol).cast("string"))),
      1, 8), 16, 10).cast("long")
    df.select(shiftright(h, remBits).as("reg"),
        h.bitwiseAND(lit((1L << remBits) - 1)).as("rem"))
      .select(col("reg"),
        when(col("rem") === 0, lit(remBits + 1))
          .otherwise(lit(remBits + 1) - length(bin(col("rem")))).as("rho"))
      .groupBy("reg").agg(max(col("rho")).cast("int").as("r"))
  }

  /** Cardinality estimate from an [[hllRegisters]] sketch: the raw HLL
    * harmonic mean  est = α_m·m² / Σ_j 2^(−M_j)  (empty register ⇒ 2⁰),
    * computed end-to-end in integers by scaling the denominator with
    * 2³²:  est = α_micro·m²·2³² DIV (10⁶·S),  S = Σ 2^(32−M_j) — each
    * term a power of two, so S is EXACT (no float-sum order dependence)
    * and ≤ m·2³². α_micro = round(10⁶·0.7213/(1 + 1.079/m)), the
    * standard bias constant for m ≥ 128, folded at plan time. The
    * numerator passes through DECIMAL(38,0) (α_micro·m²·2³² overflows
    * int64 past m=2⁹) and the final estimate lands back in BIGINT. No
    * small-range linear-counting correction: callers below ~2.5·m
    * distinct should use exact `countDistinct` — the sketch is for the
    * regime where the distinct set doesn't fit.
    *
    * @param m the register count the sketch was built with
    * @return one row (est: long) */
  def hllEstimate(regs: DataFrame, m: Int): DataFrame = {
    require(m >= 128 && m <= 65536 && (m & (m - 1)) == 0,
      s"hllEstimate needs a power-of-two m in [128, 65536], got $m")
    val alphaMicro = math.round(1e6 * 0.7213 / (1 + 1.079 / m))
    regs
      .agg(expr("coalesce(sum(shiftleft(CAST(1 AS BIGINT), 32 - r)), 0)" +
        s" + ($m - count(1)) * 4294967296").as("S"))
      .select(expr(s"CAST(CAST($alphaMicro AS DECIMAL(38,0))" +
        s" * ${m.toLong * m} * 4294967296 DIV (1000000 * S) AS BIGINT)")
        .as("est"))
  }

  /** Cardinality estimate from a [[distinctMin]] sketch. The min of n_i
    * uniform hashes over [0, 2^32) sits near 2^32/(n_i+1), but 1/min is
    * heavy-tailed (one unluckily small min wrecks a per-bucket estimate) —
    * so, as HyperLogLog does, combine buckets through the SUM of mins and
    * invert once:
    *
    *   est = k²·2^32 DIV (Σ(minh+1) + empties·2^32) − k   ≈ n
    *
    * (an empty bucket means "no hash below 2^32": it contributes the full
    * range). Integer division end-to-end — no float, engine-portable —
    * with k²·2^32 needing k ≤ 40000 to stay inside int64.
    *
    * @param k the bucket count the sketch was built with
    * @return one row (est: long) */
  def distinctEstimate(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 40000, s"distinctEstimate needs 2 <= k <= 40000, got $k")
    sketch.agg(
      expr(s"CAST(${k.toLong * k} * 4294967296 DIV " +
        s"(coalesce(sum(minh + 1), 0) + ($k - count(1)) * 4294967296) - $k " +
        "AS BIGINT)").as("est"))
  }
}
