package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(n: Int, frames: Int = 4, w: Int = 8, h: Int = 6) = {
    val rows = (1 to n).map { i =>
      (i.toLong, Array.tabulate[Byte](32)(j => ((i * 37 + j) & 0xFF).toByte))
    }
    fromBinary(spark, spark.createDataset(rows), "fake", w, h, frames)
  }

  test("decodeFrames expands payloads into typed frames with the declared shape") {
    val frames = decodeFrames(media(3)).collect()
    assert(frames.length == 3 * 4)
    frames.foreach { f =>
      assert(f.width == 8 && f.height == 6 && f.pixels.length == 48)
    }
    assert(frames.map(f => (f.mediaId, f.frameIdx)).distinct.length == 12)
  }

  test("decodeFrames is deterministic and partitioning-invariant") {
    def run(parts: Int) =
      decodeFrames(media(4).repartition(parts)).collect()
        .map(f => (f.mediaId, f.frameIdx, f.pixels.toSeq)).sortBy(x => (x._1, x._2))
    assert(run(1).toSeq == run(7).toSeq)
  }

  test("frameStride samples every k-th frame (video frame-sampling)") {
    val sampled = decodeFrames(media(2, frames = 10), frameStride = 3).collect()
    assert(sampled.map(_.frameIdx).distinct.sorted.toSeq == Seq(0, 3, 6, 9))
    assert(sampled.length == 2 * 4)
  }

  test("resize produces the target geometry, deterministically") {
    val small = resize(decodeFrames(media(2)), 4, 3).collect()
    small.foreach(f => assert(f.width == 4 && f.height == 3 && f.pixels.length == 12))
    // nearest-neighbor: every output pixel exists in the source frame
    val src = decodeFrames(media(2)).collect()
      .map(f => (f.mediaId, f.frameIdx) -> f.pixels.toSet).toMap
    small.foreach(f => assert(f.pixels.toSet.subsetOf(src((f.mediaId, f.frameIdx)))))
  }

  test("histogramFeatures emits normalized 16-bin array<float> per frame") {
    val feats = histogramFeatures(decodeFrames(media(3))).collect()
    assert(feats.length == 12)
    feats.foreach { mf =>
      assert(mf.feature.length == 16)
      assert(math.abs(mf.feature.sum - 1.0f) < 1e-5)
      mf.feature.foreach(v => assert(v >= 0f && v <= 1f))
    }
  }

  test("zero-length payloads decode without error (frames still deterministic)") {
    import spark.implicits._
    val empty = Seq(Multimodal.MediaRow(9L, Array.empty[Byte],
      Multimodal.MediaMeta("jpg", 4, 3, 2))).toDS()
    val frames = Multimodal.decodeFrames(empty).collect()
    assert(frames.length == 2)
    frames.foreach(f => assert(f.pixels.length == 12))
    // deterministic: same mix on a re-run
    assert(Multimodal.decodeFrames(empty).collect().map(_.pixels.toSeq).toSeq ==
      frames.map(_.pixels.toSeq).toSeq)
  }

  test("metadata-only projection prunes the binary payload from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("mm_spec").toString + "/media"
    media(5).write.parquet(dir)
    val metaOnly = spark.read.parquet(dir).select("mediaId", "meta.format")
    val scan = metaOnly.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema") && !scan.contains("content"))
  }
}
