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

/** STUB codec — this container has no image/audio libraries, so the
  * decode step is a deterministic fake: dimensions, frame count, and
  * features are pure functions of the byte content (an FNV-1a rolling
  * hash). Everything AROUND the codec — the typed schema, the
  * partition-parallel `mapPartitions` plumbing, strided frame
  * sampling, batch shape — is real and tested (MultimodalOpsSpec).
  * Swap in a real codec (JPEG decode, PCM resample, …) by implementing
  * [[Codec]]; no other code changes.
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
