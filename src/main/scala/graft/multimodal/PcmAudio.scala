package graft.multimodal

/** REAL audio-path decode: signed 16-bit little-endian PCM parsing and
  * frame-level signal statistics — the JDK-only audio sibling of
  * [[ImageIoCodec]] (this container ships no media libraries, but raw
  * PCM needs none: the byte layout IS the format). Everything here is
  * executor-side pure functions over the payload bytes; the Spark
  * plumbing (scan partitioning, narrow `mapPartitions`, typed rows)
  * is identical to the image path.
  *
  * All statistics are EXACT integers (sum of squares, peak absolute
  * sample, strict sign-flip zero crossings) so the q142 oracle can
  * recompute them in SQL from the generating function without any
  * float tolerance — a match gates the byte encode → parse round trip
  * bit-for-bit.
  */
object PcmAudio {

  /** One frame's exact signal statistics. `sumsq` rides a Long: a full
    *-scale int16 frame of 65k samples is ~7·10¹³, far inside range. */
  final case class FrameStats(
      asset_id: Long, frame_idx: Int, n_samples: Int,
      sumsq: Long, peak_abs: Int, zero_cross: Int)

  /** Parse signed 16-bit little-endian PCM. Trailing odd byte (a
    * truncated sample) is dropped, matching every PCM reader. */
  def decodeS16LE(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i).toInt & 0xff))
      i += 1
    }
    out
  }

  /** Encode samples as S16LE (values are truncated to int16 range by
    * the cast, callers keep amplitudes in range). */
  def encodeS16LE(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      out(2 * i) = (samples(i) & 0xff).toByte
      out(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Tumbling-frame statistics: frames of `frameLen` samples (last
    * frame may be short), per frame the exact sum of squares, peak
    * |sample|, and STRICT sign-flip zero crossings (prev·cur < 0,
    * counted within the frame only — frame boundaries never share a
    * crossing, so frame rows are independent of processing order). */
  def frameStats(assetId: Long, samples: Array[Int], frameLen: Int): Iterator[FrameStats] = {
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    val nFrames = (samples.length + frameLen - 1) / frameLen
    (0 until nFrames).iterator.map { f =>
      val from = f * frameLen
      val until = math.min(from + frameLen, samples.length)
      var sumsq = 0L
      var peak = 0
      var zc = 0
      var i = from
      while (i < until) {
        val v = samples(i)
        sumsq += v.toLong * v
        val a = math.abs(v)
        if (a > peak) peak = a
        if (i > from && samples(i - 1) * v < 0) zc += 1
        i += 1
      }
      FrameStats(assetId, f, until - from, sumsq, peak, zc)
    }
  }
}
