package graft.sources

import graft.SparkSpec
import graft.functions.Layout
import graft.plans.ZOrderExpr
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference: deinterleave z back to its dimensions. */
  private def deinterleave(z: Long, bits: Int, d: Int): Seq[Long] =
    (0 until d).map { j =>
      (0 until bits).foldLeft(0L)((acc, i) =>
        acc | (((z >>> (i * d + j)) & 1L) << i))
    }

  test("interleave/deinterleave roundtrip over random points (2 and 3 dims)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 500) {
      val x = rnd.nextInt(1 << 16).toLong
      val y = rnd.nextInt(1 << 16).toLong
      val z = ZOrderExpr.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(x, y)), 16, 2)
      assert(deinterleave(z, 16, 2) == Seq(x, y))
    }
    for (_ <- 0 until 200) {
      val p = Seq.fill(3)(rnd.nextInt(1 << 10).toLong)
      val z = ZOrderExpr.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(p.toArray), 10, 3)
      assert(deinterleave(z, 10, 3) == p)
    }
  }

  test("aligned z-cells are square tiles: both dims spread <= 2^k in a 2^2k cell") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(4000)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
    val k = 6
    val byCell = pts.groupBy { case (x, y) =>
      ZOrderExpr.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(x, y)),
        16, 2) >>> (2 * k)
    }
    byCell.foreach { case (_, cell) =>
      val xs = cell.map(_._1); val ys = cell.map(_._2)
      assert(xs.max - xs.min < (1L << k) && ys.max - ys.min < (1L << k))
    }
  }

  test("column function matches the static kernel") {
    val df = Seq((3L, 5L), (100L, 200L), (65535L, 65535L)).toDF("x", "y")
    val got = df.select(Layout.zorder(16, $"x", $"y")).as[Long].collect().toSeq
    val want = Seq((3L, 5L), (100L, 200L), (65535L, 65535L)).map { case (x, y) =>
      ZOrderExpr.compute(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(Array(x, y)), 16, 2)
    }
    assert(got == want)
  }

  test("writeZOrdered keeps per-file min/max tight in BOTH dimensions") {
    val rnd = new scala.util.Random(23)
    val pts = Seq.fill(20000)((rnd.nextInt(1 << 14).toLong, rnd.nextInt(1 << 14).toLong))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toFile
    dir.deleteOnExit()
    val path = s"$dir/z"
    Sinks.writeZOrdered(pts, path, Seq("x", "y"), bitsPerDim = 14, nFiles = 16)
    val fs = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(fs.length > 4, "expected multiple z-ordered files")
    // average per-file extent in each dim must be far below the global
    // extent — that tightness is exactly what footer-stats skipping uses
    val spans = fs.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      (d.getLong(1) - d.getLong(0), d.getLong(3) - d.getLong(2))
    }
    val avgX = spans.map(_._1).sum.toDouble / spans.length
    val avgY = spans.map(_._2).sum.toDouble / spans.length
    val global = (1 << 14).toDouble
    assert(avgX < global / 2 && avgY < global / 2,
      s"z-layout not clustering: avg spans $avgX x $avgY of $global")
  }

  test("out-of-range dimension values fail fast, not alias") {
    val bad = Seq((70000L, 5L)).toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_bad").toFile
    dir.deleteOnExit()
    val e = intercept[Exception] {
      Sinks.writeZOrdered(bad, s"$dir/z", Seq("x", "y"), bitsPerDim = 16)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("z-order dim")))
  }
}
