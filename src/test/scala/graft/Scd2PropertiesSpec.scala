package graft

import graft.operators.Scd2
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Scd2 vs a brute-force in-memory reference on random version
  * stacks: same intervals for every (key, version, payload)
  * configuration, including sparse version sequences, single-version
  * keys, and payloads that flap back to earlier values (which must
  * OPEN A NEW interval, not merge with the old one — SCD-2 tracks
  * history, not value sets). */
class Scd2PropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int = 25)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(4242L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private case class Iv(k: String, from: Long, to: Option[Long], p: Int)

  /** Straight-line reference: walk each key's versions in order,
    * open an interval on every payload change, close it at the next
    * change. */
  private def reference(rows: Seq[(String, Long, Int)]): Set[Iv] =
    rows.groupBy(_._1).flatMap { case (k, vs) =>
      val sorted = vs.sortBy(_._2)
      val opens = sorted.zipWithIndex.filter { case ((_, _, p), i) =>
        i == 0 || sorted(i - 1)._3 != p
      }.map(_._1)
      opens.zipWithIndex.map { case ((_, v, p), i) =>
        val to = if (i + 1 < opens.size) Some(opens(i + 1)._2 - 1) else None
        Iv(k, v, to, p)
      }
    }.toSet

  private val genRows: Gen[List[(String, Long, Int)]] = (for {
    nKeys <- Gen.choose(1, 4)
    perKey <- Gen.sequence[List[List[(String, Long, Int)]], List[(String, Long, Int)]](
      (1 to nKeys).map { i =>
        for {
          versions <- Gen.someOf(1L to 8L).map(_.toList.sorted)
          payloads <- Gen.listOfN(versions.size, Gen.choose(0, 2))
        } yield versions.zip(payloads).map { case (v, p) => (s"k$i", v, p) }
      }.toList)
  } yield perKey.flatten)

  test("intervals match the straight-line reference on random stacks") {
    forAll(genRows) { rows =>
      if (rows.nonEmpty) {
        val got = Scd2.intervals(
          rows.toDF("k", "version", "p"), Seq("k"), "version")
          .select(col("k"), col("from_version"), col("to_version"),
            col("payload.p"))
          .collect()
          .map(r => Iv(r.getString(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getInt(3)))
          .toSet
        val want = reference(rows)
        assert(got == want, s"\nrows=$rows\ngot=$got\nwant=$want")
      }
    }
  }
}
