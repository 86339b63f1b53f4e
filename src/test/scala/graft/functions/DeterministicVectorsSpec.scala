package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DeterministicVectorsSpec extends SparkSpec {
  import spark.implicits._

  test("decSum is exact and partitioning-invariant where double sum may not be") {
    val vals = (1 to 10000).map(i => i * 0.01) // exactly representable in Decimal(18,2)
    val df1 = vals.toDF("x").repartition(1)
    val df16 = vals.toDF("x").repartition(16)
    val s1 = df1.agg(Deterministic.decSum($"x")).collect().head.getDouble(0)
    val s16 = df16.agg(Deterministic.decSum($"x")).collect().head.getDouble(0)
    assert(s1 == s16)
    assert(s1 == vals.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
  }

  test("revenue computes Σ price·(1−discount) in exact decimal") {
    val df = Seq((100.0, 0.10), (200.0, 0.05), (50.0, 0.0)).toDF("p", "d")
    val got = df.agg(Deterministic.revenue($"p", $"d")).collect().head.getDouble(0)
    assert(got == 90.0 + 190.0 + 50.0)
  }

  test("microQuantize floors at 1e-6 into longs") {
    val df = Seq(1.2345678, -1.2345678, 0.0).toDF("x")
    assert(col0(df.select(Deterministic.microQuantize($"x"))) ==
      List(1234567L, -1234568L, 0L))
  }

  test("quantize kernel is bit-identical to the transform reference form") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"embedding".as("v"))
      .unionByName(Seq(
        Seq(0.0f, -0.0f, 1.5f, -1.5f, Float.NaN,
          Float.PositiveInfinity, Float.NegativeInfinity, Float.MinPositiveValue))
        .map(Tuple1(_)).toDF("v"))
    val cmp = corpus.select(
      Vectors.quantize($"v").as("fast"),
      transform($"v", x => floor(x * lit(1000000.0d))
        .cast(org.apache.spark.sql.types.LongType)).as("slow"))
    assert(cmp.filter(not($"fast" <=> $"slow")).isEmpty,
      "quantize kernel diverged from the reference form")
    // null dimensions stay null, exactly like the transform form
    val nullable = Seq(Seq(Option(1.5f), Option.empty[Float], Option(-0.25f)))
      .map(Tuple1(_)).toDF("v")
    val cmp2 = nullable.select(
      Vectors.quantize($"v").as("fast"),
      transform($"v", x => floor(x * lit(1000000.0d))
        .cast(org.apache.spark.sql.types.LongType)).as("slow"))
    assert(cmp2.filter(not($"fast" <=> $"slow")).isEmpty,
      "quantize kernel diverged on null elements")
  }

  test("quantize/dotQ/normSqQ compute exact integer inner products") {
    val df = Seq((Seq(1.0f, 0.0f, -1.0f), Seq(0.5f, 0.5f, 0.5f))).toDF("a", "b")
      .select(Vectors.quantize($"a").as("qa"), Vectors.quantize($"b").as("qb"))
    val row = df.select(
      Vectors.dotQ($"qa", $"qb"), Vectors.normSqQ($"qa"), Vectors.normSqQ($"qb"))
      .collect().head
    assert(row.getLong(0) == 1000000L * 500000L + 0L + (-1000000L) * 500000L)
    assert(row.getLong(1) == 2L * 1000000L * 1000000L)
    assert(row.getLong(2) == 3L * 500000L * 500000L)
  }

  test("cosineFromParts: parallel→1, orthogonal→0, antiparallel→-1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(2.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 3.0f)),
      (Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f))
    ).toDF("a", "b")
      .select(Vectors.quantize($"a").as("qa"), Vectors.quantize($"b").as("qb"))
      .select(Vectors.cosineFromParts(
        Vectors.dotQ($"qa", $"qb"), Vectors.normSqQ($"qa"), Vectors.normSqQ($"qb")))
    val got = col0(df).map(_.asInstanceOf[Double])
    assert(math.abs(got(0) - 1.0) < 1e-9)
    assert(math.abs(got(1)) < 1e-9)
    assert(math.abs(got(2) + 1.0) < 1e-9)
  }

  test("lshBucket is deterministic and buckets identical vectors together") {
    val v = Seq(0.3f, -0.7f, 0.1f, 0.9f)
    val df = Seq(Tuple1(v), Tuple1(v), Tuple1(v.map(-_))).toDF("v")
      .select(Vectors.lshBucket(Vectors.quantize($"v"), 8).as("b"))
    val got = col0(df).map(_.asInstanceOf[Long])
    assert(got(0) == got(1))
    assert(got(0) != got(2)) // negation flips every sign bit
    assert(got(0) >= 0 && got(0) < 256)
  }
}
