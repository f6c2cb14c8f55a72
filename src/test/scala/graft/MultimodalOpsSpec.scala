package graft

import graft.multimodal.{Asset, MultimodalOps}

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
}
