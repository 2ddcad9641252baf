package graft

import graft.operators.{Broadcasting, Triangles}
import org.scalacheck.Gen

class TrianglesSpec extends SparkTestBase {
  import spark.implicits._

  private def countOf(edges: Seq[(Long, Long)]): Long =
    try Triangles.count(edges.toDF("u", "v"), "u", "v")
      .head().getLong(0)
    finally Broadcasting.releaseAll()

  /** Brute reference over canonical u<v edges. */
  private def brute(edges: Seq[(Long, Long)]): Long = {
    val es = edges.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    nodes.combinations(3).count { case Seq(a, b, c) =>
      es((a, b)) && es((b, c)) && es((a, c))
    }.toLong
  }

  test("known graphs: K4, K4 minus an edge, path, star") {
    val k4 = Seq((0L,1L), (0L,2L), (0L,3L), (1L,2L), (1L,3L), (2L,3L))
    assert(countOf(k4) == 4)
    assert(countOf(k4.filterNot(_ == (2L, 3L))) == 2)
    assert(countOf(Seq((0L,1L), (1L,2L), (2L,3L))) == 0)
    // star: hub with many leaves — the shape orientation exists for
    assert(countOf((1L to 20L).map(i => (0L, i))) == 0)
    assert(countOf((1L to 20L).map(i => (0L, i)) :+ (1L, 2L)) == 1)
  }

  test("random graphs match the brute-force reference") {
    val gen = for {
      n <- Gen.choose(4, 12)
      dense <- Gen.choose(1, 3)
      pairs = (0L until n.toLong).flatMap(a =>
        (a + 1 until n.toLong).map(b => (a, b)))
      picked <- Gen.someOf(pairs)
    } yield picked.toSeq
    var seed = org.scalacheck.rng.Seed(99L)
    (0 until 12).foreach { _ =>
      val es = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      if (es.nonEmpty)
        assert(countOf(es) == brute(es), s"edges=$es")
    }
  }

  test("count is partitioning-invariant") {
    val k4 = Seq((0L,1L), (0L,2L), (0L,3L), (1L,2L), (1L,3L), (2L,3L))
    val df = k4.toDF("u", "v").repartition(7)
    val c = try Triangles.count(df, "u", "v").head().getLong(0)
    finally Broadcasting.releaseAll()
    assert(c == 4)
  }

  test("out-of-range ids fail loudly (packed-rank contract)") {
    val bad = Seq((1L, 1L << 33)).toDF("u", "v")
    val ex = intercept[Exception] {
      try Triangles.count(bad, "u", "v").collect()
      finally Broadcasting.releaseAll()
    }
    assert(ex.getMessage.contains("2^32") ||
      Option(ex.getCause).exists(_.getMessage.contains("2^32")), s"$ex")
  }
}
