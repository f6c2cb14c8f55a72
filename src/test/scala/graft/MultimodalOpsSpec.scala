package graft

import graft.multimodal.{Asset, ImageIoCodec, MultimodalOps}

/** Exercises the multimodal decode plumbing: typed schema, partition-
  * preserving mapPartitions execution, stub-codec determinism, and the
  * byte-level frame sampler.
  */
class MultimodalOpsSpec extends SparkSpec {

  private def mkAssets = (1L to 100L).map { i =>
    Asset(i, s"payload-$i-${"x" * i.toInt}".getBytes("UTF-8"),
      if (i % 2 == 0) "image/jpeg" else "video/mp4", "unit")
  }

  test("decodeFeatures is a partition-preserving distributed map") {
    val ds = spark.createDataset(mkAssets)(MultimodalOps.assetEncoder).repartition(7)
    val out = MultimodalOps.decodeFeatures(ds)
    out.rdd.getNumPartitions shouldBe 7 // narrow map — no shuffle
    val rows = out.collect().sortBy(_.asset_id)
    rows should have length 100
    rows.foreach { f =>
      f.features should have length 8
      f.width should (be >= 64 and be < 128)
      f.height should (be >= 64 and be < 128)
      f.n_bytes should be > 0
    }
    rows.filter(_.mime == "image/jpeg").foreach(_.n_frames shouldBe 1)
    all(rows.filter(_.mime == "video/mp4").map(_.n_frames)) should be >= 1
  }

  test("stub codec is deterministic across runs") {
    val ds = spark.createDataset(mkAssets)(MultimodalOps.assetEncoder)
    val a = MultimodalOps.decodeFeatures(ds).collect().sortBy(_.asset_id)
    val b = MultimodalOps.decodeFeatures(ds).collect().sortBy(_.asset_id)
    a.map(_.width).toSeq shouldBe b.map(_.width).toSeq
    a.map(_.features.toSeq).toSeq shouldBe b.map(_.features.toSeq).toSeq
  }

  test("resizeAssets is a narrow distributed map that bounds the payload") {
    val ds = spark.createDataset(mkAssets)(MultimodalOps.assetEncoder).repartition(5)
    val out = MultimodalOps.resizeAssets(ds, 4, 4)
    out.rdd.getNumPartitions shouldBe 5 // no shuffle
    val rows = out.collect().sortBy(_.asset_id)
    rows should have length 100
    rows.foreach { a =>
      a.bytes.length should be <= 16
      a.bytes.length should be >= 1
    }
    // metadata unchanged; resize only touches the payload
    rows.map(_.mime).toSeq shouldBe mkAssets.sortBy(_.asset_id).map(_.mime)
    // deterministic, and an up-"resize" never invents bytes
    val again = MultimodalOps.resizeAssets(ds, 4, 4).collect().sortBy(_.asset_id)
    again.map(_.bytes.toSeq).toSeq shouldBe rows.map(_.bytes.toSeq).toSeq
    val big = MultimodalOps.resizeAssets(ds, 1000, 1000).collect().sortBy(_.asset_id)
    big.map(_.bytes.length).toSeq shouldBe mkAssets.sortBy(_.asset_id).map(_.bytes.length)
  }

  test("frameSample strides bytes with a cap") {
    val bytes = Array.tabulate[Byte](100)(_.toByte)
    MultimodalOps.frameSample(bytes, 10, 5).toSeq shouldBe Seq[Byte](0, 10, 20, 30, 40)
    MultimodalOps.frameSample(bytes, 40, 8).toSeq shouldBe Seq[Byte](0, 40, 80)
    MultimodalOps.frameSample(bytes, 0, 5) shouldBe empty
  }

  // ---- real image decode (ImageIoCodec, JDK javax.imageio) ----

  /** A real 32×16 PNG: left half pure red, right half pure blue. */
  private def mkPng(w: Int = 32, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xff0000 else 0x0000ff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("ImageIoCodec decodes a real PNG: true raster dims + pixel statistics") {
    val f = ImageIoCodec.decode(Asset(1L, mkPng(), "image/png", "unit"))
    f.width shouldBe 32
    f.height shouldBe 16
    f.n_frames shouldBe 1
    f.features should have length 8
    // half red, half blue: meanR ≈ meanB ≈ 0.5, meanG = 0
    f.features(0) shouldBe 0.5f +- 0.01f
    f.features(1) shouldBe 0.0f +- 0.01f
    f.features(2) shouldBe 0.5f +- 0.01f
    f.features(5) shouldBe 2.0f // aspect 32/16
    f.features(6) should be > 0.0f // the red→blue seam has gradient energy
  }

  test("ImageIoCodec resize produces a real decodable raster at the target size") {
    val small = ImageIoCodec.resize(Asset(2L, mkPng(), "image/png", "unit"), 8, 4)
    small.mime shouldBe "image/png"
    val f = ImageIoCodec.decode(small)
    f.width shouldBe 8
    f.height shouldBe 4
    // nearest-neighbor keeps the two flat color fields intact
    f.features(0) shouldBe 0.5f +- 0.01f
    f.features(2) shouldBe 0.5f +- 0.01f
    // deterministic: explicit-loop resample + lossless PNG re-encode
    ImageIoCodec.resize(Asset(2L, mkPng(), "image/png", "unit"), 8, 4)
      .bytes.toSeq shouldBe small.bytes.toSeq
  }

  test("ImageIoCodec falls back to the stub per-row for non-image payloads") {
    // (Array fields: case-class == is reference equality — compare fields)
    def same(a: graft.multimodal.AssetFeatures, b: graft.multimodal.AssetFeatures): Unit = {
      (a.asset_id, a.mime, a.n_bytes, a.width, a.height, a.n_frames) shouldBe
        ((b.asset_id, b.mime, b.n_bytes, b.width, b.height, b.n_frames))
      a.features.toSeq shouldBe b.features.toSeq
    }
    val audio = Asset(3L, "not an image".getBytes("UTF-8"), "audio/wav", "unit")
    same(ImageIoCodec.decode(audio), graft.multimodal.StubCodec.decode(audio))
    // an image mime with an undecodable payload must not throw either
    val broken = Asset(4L, Array[Byte](1, 2, 3), "image/png", "unit")
    same(ImageIoCodec.decode(broken), graft.multimodal.StubCodec.decode(broken))
  }

  test("mixed-modality batch decodes through ImageIoCodec without task failure") {
    val assets = Seq(
      Asset(1L, mkPng(), "image/png", "unit"),
      Asset(2L, "pcm pcm pcm".getBytes("UTF-8"), "audio/wav", "unit"),
      Asset(3L, mkPng(64, 64), "image/png", "unit"))
    val ds = spark.createDataset(assets)(MultimodalOps.assetEncoder).repartition(2)
    val out = MultimodalOps.decodeFeatures(ds, ImageIoCodec).collect().sortBy(_.asset_id)
    out(0).width shouldBe 32 // real decode
    out(1).n_bytes shouldBe 11 // stub fallback row, decoded not failed
    out(2).width shouldBe 64
    out(2).features(5) shouldBe 1.0f // square
  }
}
