package graft

import java.sql.Timestamp

import graft.ops.Scd2Merge
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the streaming SCD2 ingest (foreachBatch merge-and-swap)
  * against the batch Scd2Merge semantics across micro-batches: close
  * on change, insert-on-next-batch (quirk b), and equality with the
  * batch kernel applied to the same snapshots in sequence.
  */
class StreamingIngestSpec extends SparkSpec {

  import StreamingIngestSpec._

  private def clockAt(s: String) = to_timestamp(lit(s))

  test("scd2Stream merges micro-batches into the target with batch semantics") {
    import spark.implicits._
    val target = tmpDir("scd2-stream-target") + "/silver"
    val checkpoint = tmpDir("scd2-stream-ckpt")
    val merge = Scd2Merge(Seq("id"), Seq("name"), clockAt("2024-01-15 05:00:00"))

    val input = MemoryStream[Rec](spark)
    val q = StreamingIngest.scd2Stream(input.toDF(), merge, target, checkpoint)
    try {
      input.addData(Rec(1, "a"), Rec(2, "b"))
      q.processAllAvailable()
      val after1 = spark.read.parquet(target)
      after1.count() shouldBe 2
      after1.filter(col(Scd2Merge.IsCurrent)).count() shouldBe 2

      // batch 2: id=1 changes, id=3 is new, id=2 absent (untouched)
      input.addData(Rec(1, "a2"), Rec(3, "c"))
      q.processAllAvailable()
      val after2 = spark.read.parquet(target)
      after2.count() shouldBe 3
      after2.filter(col("id") === 1 && !col(Scd2Merge.IsCurrent)).count() shouldBe 1
      after2.filter(col("id") === 3 && col(Scd2Merge.IsCurrent))
        .select("name").as[String].collect() shouldBe Array("c")

      // batch 3: id=1 re-arrives -> NOT MATCHED insert (quirk b)
      input.addData(Rec(1, "a2"))
      q.processAllAvailable()
      val after3 = spark.read.parquet(target)
      after3.filter(col("id") === 1).count() shouldBe 2
      after3.filter(col("id") === 1 && col(Scd2Merge.IsCurrent))
        .select("name").as[String].collect() shouldBe Array("a2")
    } finally q.stop()
  }

  test("streaming state equals the batch kernel applied to the same snapshots") {
    import spark.implicits._
    val target = tmpDir("scd2-equiv-target") + "/silver"
    val merge = Scd2Merge(Seq("id"), Seq("name"), clockAt("2024-02-01 05:00:00"))
    val snapshots = Seq(
      Seq(Rec(1, "x"), Rec(2, "y")),
      Seq(Rec(1, "x2")),
      Seq(Rec(1, "x2"), Rec(2, "y")))

    // streaming path: one foreachBatch invocation per snapshot
    snapshots.foreach(s => StreamingIngest.mergeBatch(s.toDF(), merge, target))
    val streamed = spark.read.parquet(target)
      .select("id", "name", Scd2Merge.IsCurrent)
      .as[(Long, String, Boolean)].collect().sorted

    // batch path: fold the same snapshots through the kernel directly
    val empty = Seq.empty[Rec].toDF()
      .withColumn(Scd2Merge.InsertedDate, lit(null).cast("timestamp"))
      .withColumn(Scd2Merge.ModifiedDate, lit(null).cast("timestamp"))
      .withColumn(Scd2Merge.IsCurrent, lit(true))
    val folded = snapshots.foldLeft(empty)((t, s) => merge(t, s.toDF()))
      .select("id", "name", Scd2Merge.IsCurrent)
      .as[(Long, String, Boolean)].collect().sorted

    streamed shouldBe folded
    streamed.length shouldBe 3 // 1:x closed, 1:x2 current, 2:y current
  }

  test("a swap interrupted between delete and rename recovers instead of re-bootstrapping") {
    import spark.implicits._
    val target = tmpDir("scd2-recover-target") + "/silver"
    val merge = Scd2Merge(Seq("id"), Seq("name"), clockAt("2024-03-01 05:00:00"))
    StreamingIngest.mergeBatch(Seq(Rec(1, "a"), Rec(2, "b")).toDF(), merge, target)

    // simulate the crash window: the committed table sits in the swap
    // temp dir (with its _SUCCESS marker) and the target is missing —
    // exactly the on-disk state after delete succeeded and rename never
    // ran. A parquet-written dir already carries _SUCCESS, so renaming
    // the target aside reproduces the state faithfully.
    val fs = new org.apache.hadoop.fs.Path(target)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(target),
      graft.ops.TableSwap.tmpPath(target)) shouldBe true

    // the next batch must heal the swap and merge on top of the
    // recovered history — NOT bootstrap an empty table (which would
    // treat 1:a2 as a fresh insert and lose 1:a and 2:b entirely)
    StreamingIngest.mergeBatch(Seq(Rec(1, "a2")).toDF(), merge, target)
    val after = spark.read.parquet(target)
    // quirk b: a changed row is CLOSED this run, re-inserted next run
    after.count() shouldBe 2 // 1:a closed + 2:b current
    after.filter(col("id") === 2 && col(Scd2Merge.IsCurrent)).count() shouldBe 1
    after.filter(col("id") === 1 && !col(Scd2Merge.IsCurrent)).count() shouldBe 1
    // the re-arrival inserts on the following batch, on top of the
    // recovered history
    StreamingIngest.mergeBatch(Seq(Rec(1, "a2")).toDF(), merge, target)
    val after2 = spark.read.parquet(target)
    after2.count() shouldBe 3
    after2.filter(col("id") === 1 && col(Scd2Merge.IsCurrent))
      .select("name").collect().map(_.getString(0)) shouldBe Array("a2")
  }
}

object StreamingIngestSpec {
  final case class Rec(id: Long, name: String)
}
