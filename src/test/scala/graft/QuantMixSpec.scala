package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: int8-quantized ANN recall (q169) and temperature-
  * sampled mixture weights (q170), each checked against a from-scratch
  * in-JVM twin — the oracle-independence discipline (the gate's DuckDB
  * twin is the second independent derivation; this spec is the third, so
  * the Spark plan, the SQL oracle, and plain Scala arithmetic all pin one
  * another).
  */
class QuantMixSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** md5 hex of a decimal string — the [[graft.operators.Sampling]]
    * stable-hash priority the probe set sorts by. */
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("q169 recall matches a from-scratch int8 quantization twin") {
    // load the corpus once; fixed-point quantize in plain Scala exactly
    // as Vectors.quantize states: floor(x·1e6) per component
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1e6).toLong).toArray)
      .toMap
    val probes = vecs.keys.toSeq
      .sortBy(id => (md5hex(id.toString), id)).take(256)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    def cos(a: Array[Long], b: Array[Long]): Double =
      dot(a, b).toDouble / (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))
    def top5(q: Long, corpus: Map[Long, Array[Long]]): Set[Long] =
      corpus.keys.filter(_ != q).toSeq
        .sortBy(v => (-cos(corpus(q), corpus(v)), v)).take(5).toSet
    // int8: symmetric per-vector scale, floor division (Math.floorDiv —
    // the pmod construction both engines state)
    val i8 = vecs.map { case (id, qv) =>
      val m = qv.map(math.abs).max
      id -> (if (m == 0) qv.map(_ => 0L)
             else qv.map(x => Math.floorDiv(x * 127, m)))
    }
    i8.values.foreach(v => assert(v.forall(x => x >= -127 && x <= 127)))
    val expected = probes.map { q =>
      q -> (top5(q, vecs) & top5(q, i8)).size.toLong
    }.toMap
    val got = Queries.queries("q169_int8_ann_recall")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (q, (hits, pct)) =>
      assert(hits == expected(q), s"probe $q hits")
      assert(pct == hits * 20)
    }
    // the corpus-level story the readout exists for: int8 keeps enough
    // rank fidelity to promote (measured 98.98% mean recall@5 here)
    val mean = got.values.map(_._2).sum.toDouble / got.size
    assert(mean >= 95.0, s"mean recall@5 $mean collapsed")
  }

  test("q170 weights match a from-scratch BigInt mixture twin") {
    // independent token counts: split-on-space length per doc, summed by
    // source (termFreqs' sum(tf) must equal Σ dl by construction)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), size(split(col("text"), " ")).as("dl"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val isq = docs.map { case (s, _, t) => s -> math.floor(math.sqrt(t.toDouble)).toLong }.toMap
    val ssum = isq.values.sum
    val ttot = docs.map(_._3).sum
    val expected = docs.map { case (s, nd, t) =>
      s -> ((BigInt(1000000) * isq(s) / ssum).toLong,
        (BigInt(1000) * ttot * isq(s) / (BigInt(ssum) * t)).toLong, nd, t)
    }.toMap
    val got = Queries.queries("q170_mixture_weights")(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (wppm, em, nd, t) = expected(r.getString(0))
      assert(r.getLong(1) == nd && r.getLong(2) == t, s"${r.getString(0)} stats")
      assert(r.getLong(3) == wppm, s"${r.getString(0)} weight_ppm")
      assert(r.getLong(4) == em, s"${r.getString(0)} epochs_milli")
    }
    // mixture invariants: floors lose < 1 ppm per source; α = 0.5
    // upweights below-average sources past one epoch
    val wsum = got.map(_.getLong(3)).sum
    assert(wsum <= 1000000L && wsum > 1000000L - got.length)
    val avg = ttot / got.length
    got.filter(_.getLong(2) < avg / 2).foreach(r =>
      assert(r.getLong(4) > 1000, s"${r.getString(0)} small source must repeat"))
  }

  test("q171 rank is the exact (bin, md5, doc_id) permutation") {
    // independent twin of the SHUFFLE + DISTRIBUTED RANK (the logit
    // formula itself is pinned by q121's oracle): recompute the md5
    // priority in plain JVM code, sort, and demand the globalCumSum rank
    // reproduce the single-machine permutation bit-for-bit
    val rows = Queries.queries("q171_curriculum_order")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    def h32(id: Long): Long =
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16)
    val expected = rows.map { case (id, bin, _) => (id, bin) }
      .sortBy { case (id, bin) => (bin, h32(id), id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
      "rank must be a 1..N permutation")
    rows.foreach { case (id, _, rank) =>
      assert(rank == expected(id), s"doc $id rank")
    }
    // curriculum shape: all of a better bin precedes any worse bin
    val maxByBin = rows.groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    maxByBin.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(a, b) =>
        assert(maxByBin(a) < rows.filter(_._2 == b).map(_._3).min,
          s"bin $a must fully precede bin $b")
      case _ =>
    }
  }
}
