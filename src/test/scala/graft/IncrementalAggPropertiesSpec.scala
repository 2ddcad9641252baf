package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.DataFrame
import org.scalacheck.Gen

/** IncrementalAgg.maintain vs direct re-aggregation on RANDOM
  * corpora + changelogs: for any base table and any legal mutation
  * mix (in-place updates, group moves, deletes, inserts — including
  * whole groups vanishing and brand-new groups appearing), the
  * maintained summary must equal aggregating the mutated corpus from
  * scratch. Groups are drawn from a tiny alphabet so collisions,
  * moves-into-existing and moves-into-new groups all occur; measures
  * include negatives and zeros. */
private[graft] case class IvmRec(id: Long, g: String, m: Long)

class IncrementalAggPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def forAll[T](gen: Gen[T], n: Int = 20)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(1717L)
    (0 until n).foreach { _ =>
      f(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private sealed trait Mut
  private case class Update(id: Long, newM: Long) extends Mut
  private case class Move(id: Long, newG: String) extends Mut
  private case class Delete(id: Long) extends Mut
  private case class Insert(row: IvmRec) extends Mut

  private val genCase: Gen[(List[IvmRec], List[Mut])] = for {
    n <- Gen.choose(1, 30)
    gs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
    ms <- Gen.listOfN(n, Gen.choose(-50L, 50L))
    base = gs.zip(ms).zipWithIndex.map { case ((g, m), i) =>
      IvmRec(i.toLong, g, m)
    }
    // each existing id mutated at most once; inserts get fresh ids
    mutIds <- Gen.someOf(base.map(_.id))
    muts <- Gen.sequence[List[Mut], Mut](mutIds.toList.map { id =>
      Gen.oneOf(
        Gen.choose(-50L, 50L).map(Update(id, _)),
        Gen.oneOf("a", "b", "c", "d", "e").map(Move(id, _)),
        Gen.const(Delete(id)))
    })
    nIns <- Gen.choose(0, 5)
    ins <- Gen.listOfN(nIns, for {
      g <- Gen.oneOf("a", "b", "c", "d", "e", "f")
      m <- Gen.choose(-50L, 50L)
    } yield Insert(IvmRec(0L, g, m)))
  } yield (base, muts ++ ins.zipWithIndex.map { case (i, k) =>
    Insert(i.row.copy(id = 1000L + k))
  })

  private def applyMuts(base: List[IvmRec], muts: List[Mut]): List[IvmRec] = {
    val byId = base.map(r => r.id -> r).toMap
    val survivors = base.flatMap { r =>
      muts.collectFirst {
        case Update(id, m) if id == r.id => Some(r.copy(m = m))
        case Move(id, g) if id == r.id => Some(r.copy(g = g))
        case Delete(id) if id == r.id => None
      }.getOrElse(Some(r))
    }
    survivors ++ muts.collect { case Insert(r) if !byId.contains(r.id) => r }
  }

  private def changelog(base: List[IvmRec], muts: List[Mut]): DataFrame = {
    val byId = base.map(r => r.id -> r).toMap
    val dels = muts.collect {
      case Update(id, _) => byId(id)
      case Move(id, _) => byId(id)
      case Delete(id) => byId(id)
    }
    val ins = muts.collect {
      case Update(id, m) => byId(id).copy(m = m)
      case Move(id, g) => byId(id).copy(g = g)
      case Insert(r) => r
    }
    IncrementalAgg.signedDelta(
      dels.toDF("id", "g", "m"), ins.toDF("id", "g", "m"))
  }

  test("maintain == re-aggregate for random corpora and changelogs") {
    forAll(genCase) { case (base, muts) =>
      val summary = IncrementalAgg.aggregate(
        base.toDF("id", "g", "m"), Seq("g"), Seq("m"))
      val maintained = IncrementalAgg.maintain(summary,
        changelog(base, muts), Seq("g"), Seq("m"))
        .collect().map(_.toSeq).toSet
      val direct = IncrementalAgg.aggregate(
        applyMuts(base, muts).toDF("id", "g", "m"), Seq("g"), Seq("m"))
        .collect().map(_.toSeq).toSet
      assert(maintained == direct,
        s"base=$base\nmuts=$muts\nmaintained=$maintained\ndirect=$direct")
    }
  }
}
