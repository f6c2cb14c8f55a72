package graft.multimodal

/** REAL video-path plumbing: a minimal length-prefixed frame container
  * — `"GVID" | n_frames:int32BE | (len:int32BE | frame bytes)*` — the
  * deliberately simple stand-in for MP4/AVI (this container ships no
  * media demuxers; the BYTE-LEVEL work a demuxer does — magic check,
  * length-walking, bounds validation, frame extraction — is all real
  * here, and each extracted frame is a real PNG decoded by
  * [[ImageIoCodec]]'s `javax.imageio` path). Executor-side pure
  * functions; the Spark plumbing is the same narrow `mapPartitions`
  * shape as the image (q112) and audio (q142) paths.
  */
object VideoContainer {
  private val Magic = Array[Byte]('G', 'V', 'I', 'D')

  final case class Frame(idx: Int, bytes: Array[Byte])

  private def writeInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def pack(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic, 0, 4)
    writeInt(out, frames.length)
    frames.foreach { f => writeInt(out, f.length); out.write(f, 0, f.length) }
    out.toByteArray
  }

  /** Walk the container; malformed input (bad magic, truncated frame,
    * negative length) fails loudly — a demuxer that silently yields
    * garbage frames poisons everything downstream. */
  def parse(container: Array[Byte]): Seq[Frame] = {
    require(container.length >= 8 &&
      Magic.indices.forall(i => container(i) == Magic(i)), "bad GVID magic")
    val n = readInt(container, 4)
    require(n >= 0, s"negative frame count $n")
    var off = 8
    (0 until n).map { i =>
      require(off + 4 <= container.length, s"truncated header at frame $i")
      val len = readInt(container, off)
      // bounds math in Long: an Int sum wraps negative for len near
      // Int.MaxValue and would misreport the failure as copyOfRange's
      require(len >= 0 && off.toLong + 4L + len <= container.length,
        s"truncated frame $i (len=$len)")
      val bytes = java.util.Arrays.copyOfRange(container, off + 4, off + 4 + len)
      off += 4 + len
      Frame(i, bytes)
    }
  }

  /** Keyframe-style strided sampling: every `stride`-th frame. */
  def sampleFrames(container: Array[Byte], stride: Int): Seq[Frame] = {
    require(stride > 0, s"stride must be positive, got $stride")
    parse(container).filter(_.idx % stride == 0)
  }
}
