package graft

import graft.operators.{Bfs, Broadcasting}
import org.scalacheck.Gen

/** Random-graph properties for the two closure algorithms: on ANY
  * directed graph (self-loops, cycles, islands included), any source
  * set, any budget and either seed mode, the frontier walk
  * (minHopsPerSource) and the doubling closure (minHopsDoubling)
  * must BOTH equal an independent in-memory reference BFS — a
  * three-way check, so a bug shared by the two distributed
  * spellings still gets caught. */
class BfsPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(4242L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private case class Case(edges: Set[(Long, Long)], sources: Set[Long],
    maxHops: Int, seedReached: Boolean)

  private val genCase: Gen[Case] = for {
    nEdges <- Gen.choose(0, 18)
    es <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, 7L); b <- Gen.choose(0L, 7L)
    } yield (a, b)) // self-loops allowed on purpose
    srcs <- Gen.nonEmptyListOf(Gen.choose(0L, 7L))
    maxHops <- Gen.choose(0, 6)
    seedReached <- Gen.oneOf(true, false)
  } yield Case(es.toSet, srcs.toSet, maxHops, seedReached)

  /** Shortest-walk BFS per source; seedReached=false omits the
    * zero-length path so the origin re-enters at its shortest closed
    * walk (shortest walks never revisit interior nodes, so a plain
    * visited set stays exact in both modes). */
  private def ref(c: Case): Set[(Long, Long, Int)] = {
    val adj = c.edges.groupMap(_._1)(_._2)
    c.sources.flatMap { s =>
      var dist =
        if (c.seedReached) Map(s -> 0) else Map.empty[Long, Int]
      var frontier = Set(s)
      var h = 0
      while (h < c.maxHops && frontier.nonEmpty) {
        h += 1
        val nxt = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .filterNot(dist.contains)
        nxt.foreach(v => dist += v -> h)
        frontier = nxt
      }
      dist.map { case (v, d) => (s, v, d) }
    }
  }

  test("frontier walk and doubling closure both match the reference " +
    "on random graphs") {
    forAll(genCase, n = 8) { c =>
      val expected = ref(c)
      // an empty edge frame still needs the (src, dst) schema
      val e = (if (c.edges.isEmpty) Seq((0L, 0L)).toDF("src", "dst")
        .filter(org.apache.spark.sql.functions.lit(false))
      else c.edges.toSeq.toDF("src", "dst"))
      val srcs = c.sources.toSeq.toDF("id")
      def run(df: org.apache.spark.sql.DataFrame) =
        try df.as[(Long, Long, Int)].collect().toSet
        finally Broadcasting.releaseAll()
      val walked = run(Bfs.minHopsPerSource(e, srcs, c.maxHops,
        seedReached = c.seedReached))
      assert(walked == expected, s"frontier walk vs reference: $c\n" +
        s"walked=$walked\nexpected=$expected")
      val doubled = run(Bfs.minHopsDoubling(e, srcs, c.maxHops,
        seedReached = c.seedReached))
      assert(doubled == expected, s"doubling vs reference: $c\n" +
        s"doubled=$doubled\nexpected=$expected")
    }
  }
}
