package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Multimodal-column plumbing for training-data pipelines (extension scope):
  * image/audio/video as opaque `binary` columns plus a typed metadata
  * struct, with decode / frame-sample / resize / feature-extract as
  * partition-level transforms.
  *
  * The DECODE step is an injectable function. For IMAGES it is real:
  * [[imageIoDecoder]] decodes PNG/BMP/GIF bytes through the JDK's
  * `javax.imageio` (no external codec libraries needed), and
  * [[encodePng]] is its lossless write-side twin — MultimodalSpec drives
  * real PNG bytes through decode → resize → histogram bit-exactly. Video
  * and audio codecs are NOT in the JDK and this environment cannot
  * resolve external ones, so multi-frame payloads keep the deterministic
  * [[stubDecoder]] default (swap in a JNI/FFmpeg-backed factory in a real
  * deployment). Everything Spark-side is identical either way and
  * load-bearing at 100 TB:
  *  - typed schemas (`MediaRow` / `Frame` / `MediaFeature`) with case-class
  *    Encoders, so columnar pruning and codegen apply around the seam;
  *  - `mapPartitions` batching: the decoder is instantiated ONCE per
  *    partition (the expensive codec-init pattern), then streamed over the
  *    partition's rows — never per row, never on the driver;
  *  - per-row expansion (video → frames) stays lazy inside the partition
  *    iterator, so wide rows never materialize as a whole partition in
  *    memory;
  *  - binary payloads pass through untouched unless decoded — scans prune
  *    `content` away when only metadata is selected.
  *
  * Swap `stubDecoder` for a JNI/FFmpeg-backed implementation by passing a
  * different `decoder` — the seam (signature, batching, schema) is the
  * contract.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  final case class MediaMeta(format: String, width: Int, height: Int,
      nFrames: Int)

  final case class MediaRow(mediaId: Long, content: Array[Byte],
      meta: MediaMeta)

  /** One decoded frame: row-major grayscale bytes. */
  final case class Frame(mediaId: Long, frameIdx: Int, width: Int,
      height: Int, pixels: Array[Byte])

  final case class MediaFeature(mediaId: Long, frameIdx: Int,
      feature: Array[Float])

  /** A decoder turns one payload into its frames. Instantiated per
    * partition via the factory so codec state is reused across rows. */
  type Decoder = MediaRow => Iterator[Frame]
  type DecoderFactory = () => Decoder

  /** Deterministic stub decoder: frame pixels derive from (content bytes,
    * frame index) by a rolling mix — stable across runs/partitionings, no
    * codec libs. Pixel count honors meta.width × meta.height. */
  val stubDecoder: DecoderFactory = () => { row =>
    val n = row.meta.width * row.meta.height
    val cl = row.content.length // may be 0: mix rolls over acc alone
    (0 until row.meta.nFrames).iterator.map { f =>
      val px = new Array[Byte](n)
      var acc = f * 131 + 17
      var i = 0
      while (i < n) {
        acc = acc * 31 + (if (cl == 0) 0 else row.content(i % cl) & 0xFF)
        px(i) = (acc & 0xFF).toByte
        i += 1
      }
      Frame(row.mediaId, f, row.meta.width, row.meta.height, px)
    }
  }

  /** REAL image decode for the seam — JDK-native `javax.imageio` (PNG /
    * BMP / GIF readers ship with the JRE; no external codec libraries,
    * which this environment cannot resolve). One still frame per payload:
    * frameIdx 0, ACTUAL decoded dimensions (meta carries the intended
    * shape; a real pipeline validates or resizes downstream), pixels
    * row-major 8-bit luminance via the integer BT.601 weights
    * (299·R + 587·G + 114·B) / 1000 — deterministic across JVMs, unlike
    * `ColorConvertOp`, whose ICC colorimetric path is platform-tuned.
    *
    * Undecodable payloads yield NO frame rather than a poison-pill
    * exception: at 100 TB corrupt bytes are data, not bugs — count them
    * with an `observe` on the upstream scan if the drop rate matters.
    *
    * The factory body runs once per partition ([[decodeFrames]]'s
    * contract): it disables ImageIO's disk cache there (otherwise every
    * image round-trips a temp file) before the row loop. MultimodalSpec
    * drives real PNG bytes through decode → resize → histogram and checks
    * the pixels exactly; [[stubDecoder]] stays as the deterministic twin
    * for partition-invariance and video (multi-frame) shapes.
    */
  val imageIoDecoder: DecoderFactory = () => {
    javax.imageio.ImageIO.setUseCache(false) // once per partition
    row =>
      // NonFatal around decode AND pixel copy: JDK ImageIO readers throw
      // RuntimeExceptions (ArrayIndexOutOfBounds, IllegalArgument,
      // NegativeArraySize…) on malformed/truncated payloads, not just
      // IOException — catching only the latter left a task-killing poison
      // pill for adversarial bytes (ADVICE r8). Corrupt payloads are data
      // at 100 TB: drop the frame, count drops upstream if the rate matters.
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(row.content))
        if (img == null) Iterator.empty
        else {
          val w = img.getWidth
          val h = img.getHeight
          val px = new Array[Byte](w * h)
          val cm = img.getColorModel
          if (cm.getNumColorComponents == 1) {
            // single-component (grayscale) images: read raster samples
            // directly — getRGB would run the gray→sRGB colorspace
            // conversion, which is NOT identity, breaking the lossless
            // decode(encode(px)) == px round-trip. Samples wider than
            // 8 bits (16-bit gray PNG) scale down by their extra depth —
            // a bare .toByte would keep the LOW bits (garbage luminance,
            // ADVICE r8)
            val shift = math.max(0, cm.getComponentSize(0) - 8)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                px(y * w + x) =
                  (img.getRaster.getSample(x, y, 0) >> shift).toByte
                x += 1
              }
              y += 1
            }
          } else {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                px(y * w + x) = ((299 * ((rgb >> 16) & 0xFF)
                  + 587 * ((rgb >> 8) & 0xFF)
                  + 114 * (rgb & 0xFF)) / 1000).toByte
                x += 1
              }
              y += 1
            }
          }
          Iterator.single(Frame(row.mediaId, 0, w, h, px))
        }
      } catch {
        case scala.util.control.NonFatal(_) => Iterator.empty
      }
  }

  /** Write-side twin of [[imageIoDecoder]]: row-major grayscale pixels →
    * PNG bytes (lossless, so decode(encode(px)) == px exactly — the spec's
    * round-trip proof). Fixture generation and sink-side materialization
    * of derived frames both use it; JDK-native like the decoder. */
  def encodePng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height,
      s"pixels ${pixels.length} != $width x $height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]
  implicit val featureEnc: Encoder[MediaFeature] = Encoders.product[MediaFeature]

  /** Decode every `stride`-th frame of every payload. The codec factory
    * runs once per partition; frames stream lazily. */
  def decodeFrames(media: Dataset[MediaRow], decoder: DecoderFactory = stubDecoder,
      frameStride: Int = 1): Dataset[Frame] =
    media.mapPartitions { rows =>
      val decode = decoder() // once per partition
      rows.flatMap(r => decode(r).filter(_.frameIdx % frameStride == 0))
    }

  /** Nearest-neighbor resize on decoded frames — pure per-row math, no
    * shuffle; runs inside the same partition pass as decode when composed. */
  def resize(frames: Dataset[Frame], newW: Int, newH: Int): Dataset[Frame] =
    frames.map { fr =>
      val px = new Array[Byte](newW * newH)
      var y = 0
      while (y < newH) {
        val sy = y * fr.height / newH
        var x = 0
        while (x < newW) {
          px(y * newW + x) = fr.pixels(sy * fr.width + (x * fr.width / newW))
          x += 1
        }
        y += 1
      }
      Frame(fr.mediaId, fr.frameIdx, newW, newH, px)
    }

  /** Feature extraction: 16-bin normalized intensity histogram per frame —
    * the deterministic stand-in for an embedding model, emitting the
    * `array<float>` shape the similarity operators (graft.functions.Vectors)
    * consume. */
  def histogramFeatures(frames: Dataset[Frame]): Dataset[MediaFeature] =
    frames.map { fr =>
      val bins = new Array[Float](16)
      var i = 0
      while (i < fr.pixels.length) {
        bins((fr.pixels(i) & 0xFF) >> 4) += 1f
        i += 1
      }
      val n = math.max(1, fr.pixels.length).toFloat
      var b = 0
      while (b < 16) { bins(b) /= n; b += 1 }
      MediaFeature(fr.mediaId, fr.frameIdx, bins)
    }

  /** Build a MediaRow dataset from any table with an id and a binary-able
    * column — the ingestion adapter used by tests and the q40 surface. */
  def fromBinary(spark: SparkSession, ids: Dataset[(Long, Array[Byte])],
      format: String, width: Int, height: Int, nFrames: Int): Dataset[MediaRow] = {
    import spark.implicits._
    ids.map { case (id, bytes) =>
      MediaRow(id, bytes, MediaMeta(format, width, height, nFrames))
    }
  }
}
