package graft.multimodal

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Typed multimodal asset: an opaque binary payload plus typed
  * metadata. Image/audio/video all travel as `bytes` + `mime`; the
  * engine never interprets the payload outside a [[Codec]].
  */
final case class Asset(asset_id: Long, bytes: Array[Byte], mime: String, source: String)

/** Decoded per-asset features: dimensions, frame count, and a fixed-
  * width float feature vector (what a real decoder/embedder would
  * emit).
  */
final case class AssetFeatures(
    asset_id: Long,
    mime: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float])

/** Pluggable decode/feature-extract codec. Implementations run inside
  * executor tasks (`mapPartitions`), so they must be serializable and
  * must not touch the driver.
  */
trait Codec extends Serializable {
  def decode(a: Asset): AssetFeatures

  /** Re-encode the payload at the target raster size (a real codec
    * decodes → resamples → re-encodes; the stub nearest-neighbors the
    * byte stream). Metadata (id/mime/source) is preserved. */
  def resize(a: Asset, width: Int, height: Int): Asset
}

/** Deterministic fallback codec for payload formats with no real
  * decoder wired up (e.g. MP4/AVI — this container ships no media
  * libraries; images go through [[ImageIoCodec]], raw PCM audio
  * through [[PcmAudio]], and GVID frame containers through
  * [[VideoContainer]] + per-frame image decode): dimensions,
  * frame count, and features are pure functions of the byte content
  * (an FNV-1a rolling hash). Images go through the REAL
  * [[ImageIoCodec]] (JDK `javax.imageio`, below), which falls back
  * here per-row for non-image mimes, so mixed batches decode without
  * task failure. Swap in a real audio/video codec (PCM resample,
  * frame extraction, …) by implementing [[Codec]]; no other code
  * changes.
  */
object StubCodec extends Codec {
  private val FeatureDim = 8

  private def fnv1a(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = math.min(until, bytes.length)
    while (i < end) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  def decode(a: Asset): AssetFeatures = {
    val h = fnv1a(a.bytes, 0, a.bytes.length)
    val feats = Array.tabulate(FeatureDim) { i =>
      // per-dimension fake feature: hash of the i-th stride of bytes
      val step = math.max(1, a.bytes.length / FeatureDim)
      (fnv1a(a.bytes, i * step, (i + 1) * step) % 1000L).toFloat / 1000f
    }
    AssetFeatures(
      asset_id = a.asset_id,
      mime = a.mime,
      n_bytes = a.bytes.length,
      width = 64 + math.floorMod(h, 64L).toInt,
      height = 64 + math.floorMod(h >> 8, 64L).toInt,
      n_frames = if (a.mime.startsWith("video/")) 1 + math.floorMod(h >> 16, 32L).toInt else 1,
      features = feats)
  }

  /** Deterministic fake resize: nearest-neighbor byte sampling down (or
    * identity up) to `width*height` payload bytes. */
  def resize(a: Asset, width: Int, height: Int): Asset =
    if (a.bytes.isEmpty) a // nothing to resample; avoids a -1 index below
    else {
      val target = math.max(1, math.min(a.bytes.length, width * height))
      val stride = a.bytes.length.toDouble / target
      a.copy(bytes = Array.tabulate(target)(i =>
        a.bytes(math.min(a.bytes.length - 1, (i * stride).toInt))))
    }
}

/** Real image codec on the JDK's own `javax.imageio` — no external
  * libraries. Handles the formats the JDK ships readers for (PNG,
  * JPEG, GIF, BMP, WBMP); any other mime (audio/video/unknown) falls
  * back to [[StubCodec]] so mixed-modality batches still decode
  * row-by-row without partition failure.
  *
  *  - `decode`: true raster dimensions, reader frame count (animated
  *    GIFs report their real frame total), and an 8-dim feature vector
  *    of deterministic image statistics — mean R/G/B, mean luma, luma
  *    stddev, aspect ratio, mean gradient magnitude (edge energy), and
  *    fraction of dark pixels. Pure integer/double arithmetic over
  *    pixels: identical on every JVM.
  *  - `resize`: decode → explicit-loop nearest-neighbor resample
  *    (NOT Graphics2D scaling, whose interpolation is implementation-
  *    defined) → PNG re-encode (lossless, deterministic payload for a
  *    given raster).
  *
  * Codec instances hold no state; `ImageIO.setUseCache(false)` keeps
  * executor tasks off local disk for the stream plumbing.
  */
object ImageIoCodec extends Codec {
  import java.awt.image.BufferedImage
  import javax.imageio.ImageIO

  private def imageMime(m: String): Boolean = m.startsWith("image/")

  private def readImage(a: Asset): Option[(BufferedImage, Int)] = {
    ImageIO.setUseCache(false)
    val in = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(a.bytes))
    try {
      val readers = ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          val frames =
            try math.max(1, r.getNumImages(true))
            catch { case _: Throwable => 1 }
          Some((r.read(0), frames))
        } finally r.dispose()
      }
    } catch { case _: Throwable => None } finally in.close()
  }

  def decode(a: Asset): AssetFeatures =
    (if (imageMime(a.mime)) readImage(a) else None) match {
      case None => StubCodec.decode(a) // non-image or undecodable payload
      case Some((img, frames)) =>
        val w = img.getWidth; val h = img.getHeight
        val n = w.toLong * h
        var sr, sg, sb, sy, syy, grad = 0.0
        var dark = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = img.getRGB(x, y)
            val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
            val luma = 0.299 * r + 0.587 * g + 0.114 * b
            sr += r; sg += g; sb += b; sy += luma; syy += luma * luma
            if (luma < 32.0) dark += 1
            if (x > 0) { // horizontal gradient: mean |Δluma| across columns
              val q = img.getRGB(x - 1, y)
              val ql = 0.299 * ((q >> 16) & 0xff) + 0.587 * ((q >> 8) & 0xff) + 0.114 * (q & 0xff)
              grad += math.abs(luma - ql)
            }
            x += 1
          }
          y += 1
        }
        val meanY = sy / n
        val stdY = math.sqrt(math.max(0.0, syy / n - meanY * meanY))
        AssetFeatures(
          asset_id = a.asset_id, mime = a.mime, n_bytes = a.bytes.length,
          width = w, height = h, n_frames = frames,
          features = Array(
            (sr / n / 255.0).toFloat, (sg / n / 255.0).toFloat, (sb / n / 255.0).toFloat,
            (meanY / 255.0).toFloat, (stdY / 255.0).toFloat,
            (w.toDouble / h).toFloat,
            (if (w > 1) grad / ((w - 1).toLong * h) / 255.0 else 0.0).toFloat,
            (dark.toDouble / n).toFloat))
    }

  def resize(a: Asset, width: Int, height: Int): Asset =
    (if (imageMime(a.mime)) readImage(a) else None) match {
      case None => StubCodec.resize(a, width, height)
      case Some((img, _)) =>
        val out = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        val sx = img.getWidth.toDouble / width
        val sy = img.getHeight.toDouble / height
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            out.setRGB(x, y, img.getRGB(
              math.min(img.getWidth - 1, (x * sx).toInt),
              math.min(img.getHeight - 1, (y * sy).toInt)))
            x += 1
          }
          y += 1
        }
        val buf = new java.io.ByteArrayOutputStream()
        ImageIO.write(out, "png", buf) // lossless: resize→decode round-trips
        a.copy(bytes = buf.toByteArray, mime = "image/png")
    }
}

/** Distributed multimodal plumbing (SURVEY §7.5 b; no reference
  * analog — the reference pipeline is tabular-only, §2.9). The decode
  * path is the one place the engine runs imperative per-row logic, so
  * it is an explicit `mapPartitions` (one codec instance per task,
  * amortized across the partition's rows) rather than a per-row UDF.
  *
  * Scale notes: decode is embarrassingly parallel and shuffle-free;
  * partition sizing is inherited from the scan
  * (`spark.sql.files.maxPartitionBytes`), which is the right knob when
  * payloads are MBs — at 100 TB the only tuning is smaller input
  * partitions, not different code.
  */
object MultimodalOps {

  implicit val assetEncoder: Encoder[Asset] = Encoders.product[Asset]
  implicit val featuresEncoder: Encoder[AssetFeatures] = Encoders.product[AssetFeatures]

  /** Decode + feature-extract each asset with `codec`, preserving
    * partitioning (narrow map, no shuffle). */
  def decodeFeatures(assets: Dataset[Asset], codec: Codec = StubCodec): Dataset[AssetFeatures] =
    assets.mapPartitions(_.map(codec.decode))

  /** Batch resize through the codec, same narrow `mapPartitions`
    * plumbing as decode (one codec per task, no shuffle). */
  def resizeAssets(
      assets: Dataset[Asset], width: Int, height: Int,
      codec: Codec = StubCodec): Dataset[Asset] =
    assets.mapPartitions(_.map(codec.resize(_, width, height)))

  /** Strided frame/byte sampling: every `stride`-th byte, up to `k`
    * samples — the byte-level analog of video frame sampling. */
  def frameSample(bytes: Array[Byte], stride: Int, k: Int): Array[Byte] =
    Array.tabulate(math.min(k, if (stride <= 0) 0 else (bytes.length + stride - 1) / stride)) {
      i => bytes(i * stride)
    }
}
