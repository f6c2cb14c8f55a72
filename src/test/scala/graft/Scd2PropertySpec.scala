package graft

import graft.ops.Scd2Merge
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants of the SCD2 merge over randomized
  * snapshot sequences (seeded scalacheck generators, deterministic
  * across runs). The unit spec pins the reference quirks on crafted
  * cases; this spec checks the structural invariants no input sequence
  * may violate:
  *
  *  1. at most one `is_current` row per business key;
  *  2. row count never decreases across merges (history is append-only);
  *  3. every key ever seen still has >= 1 row, and no unseen key exists;
  *  4. convergence: merging the same (null-free) snapshot twice makes
  *     every snapshot key's current row carry the snapshot values —
  *     the close-only quirk delays the insert by exactly one run,
  *     never more.
  */
class Scd2PropertySpec extends SparkSpec {

  import Scd2PropertySpec.Snap
  import spark.implicits._

  private val snapGen: Gen[List[List[Snap]]] = {
    val row = for {
      id <- Gen.choose(1L, 25L)
      a <- Gen.oneOf("x", "y", "z", "w")
      b <- Gen.choose(0L, 3L)
    } yield Snap(id, a, b)
    val snapshot = Gen.listOfN(18, row)
      .map(_.groupBy(_.id).map(_._2.head).toList) // one row per key
    Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, snapshot))
  }

  private def sample(i: Long): List[List[Snap]] =
    snapGen.pureApply(Gen.Parameters.default, Seed(i))

  private val merge = Scd2Merge(Seq("id"), Seq("a", "b"), to_timestamp(lit("2024-03-01 05:00:00")))

  private def emptyTarget: DataFrame = Seq.empty[Snap].toDF()
    .withColumn(Scd2Merge.InsertedDate, lit(null).cast("timestamp"))
    .withColumn(Scd2Merge.ModifiedDate, lit(null).cast("timestamp"))
    .withColumn(Scd2Merge.IsCurrent, lit(true))

  test("invariants hold across randomized snapshot sequences") {
    (1L to 6L).foreach { seed =>
      val snaps = sample(seed)
      var target = emptyTarget
      var prevCount = 0L
      val seen = scala.collection.mutable.Set[Long]()
      snaps.foreach { snap =>
        target = merge(target, snap.toDF()).cache()
        seen ++= snap.map(_.id)

        val perKeyCurrent = target.filter(col(Scd2Merge.IsCurrent))
          .groupBy("id").count().agg(max("count")).as[Long].collect().head
        withClue(s"seed=$seed: ") { perKeyCurrent should be <= 1L }

        val count = target.count()
        withClue(s"seed=$seed: ") { count should be >= prevCount }
        prevCount = count

        val keys = target.select("id").distinct().as[Long].collect().toSet
        withClue(s"seed=$seed: ") { keys shouldBe seen.toSet }
      }

      // convergence: double-merge of the final snapshot
      val last = snaps.last
      target = merge(merge(target, last.toDF()), last.toDF())
      val current = target.filter(col(Scd2Merge.IsCurrent))
        .select("id", "a", "b").as[(Long, String, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      last.foreach { s =>
        withClue(s"seed=$seed key=${s.id}: ") {
          current(s.id) shouldBe (s.a, s.b)
        }
      }
    }
  }
}

object Scd2PropertySpec {
  final case class Snap(id: Long, a: String, b: Long)
}
