package graft

import graft.operators.Enrich
import org.apache.spark.sql.functions._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** The fake external service lives in a companion object so executor
  * tasks (same JVM under local[*]) and the driver share its counters. */
object EnrichSpecService {
  val calls = new AtomicInteger(0)
  val perKey = new ConcurrentHashMap[String, Integer]()
  def reset(): Unit = { calls.set(0); perKey.clear() }
  def fetch(k: String): Option[String] = {
    calls.incrementAndGet()
    perKey.merge(k, 1, (a, b) => a + b)
    if (k.startsWith("boom")) throw new RuntimeException(s"fetch $k failed")
    else if (k.startsWith("miss")) None
    else Some(s"val-$k")
  }
}

class EnrichSpec extends SparkTestBase {
  import spark.implicits._

  test("hit, miss, and failure paths; one fetch per distinct key") {
    EnrichSpecService.reset()
    // duplicate keys on purpose: 6 fact rows, 3 distinct keys
    val facts = Seq("hit1", "hit1", "miss1", "miss1", "boom1", "boom1")
      .zipWithIndex.toDF("k", "row_id")
    val out = Enrich.enrich(facts, "k", "fetched")(EnrichSpecService.fetch)
      .collect().map(r => (r.getString(0), Option(r.getString(2)))).toSet
    assert(out == Set(
      ("hit1", Some("val-hit1")), ("miss1", None), ("boom1", None)))
    // distinct-keys contract: the service saw each key exactly once
    assert(EnrichSpecService.calls.get() == 3,
      s"expected 3 fetches, saw ${EnrichSpecService.calls.get()}")
    assert(EnrichSpecService.perKey.get("hit1") == 1)
    // left join: no fact rows dropped
    assert(Enrich.enrich(facts, "k", "f")(EnrichSpecService.fetch)
      .count() == 6)
  }

  test("lookupTable records misses and failures (negative cache)") {
    EnrichSpecService.reset()
    val facts = Seq("hit1", "miss1", "boom1").toDF("k")
    val lut = Enrich.lookupTable(facts, "k")(EnrichSpecService.fetch)
      .collect().map(r => (r.getString(0),
        Option(r.getString(1)), r.getBoolean(2))).toSet
    assert(lut == Set(
      ("hit1", Some("val-hit1"), true),
      ("miss1", None, true),      // a true miss: service answered "no"
      ("boom1", None, false)))    // a failure: retryable via fetch_ok
  }

  test("null keys are skipped, non-string keys are cast") {
    EnrichSpecService.reset()
    val facts = Seq(Some(1L), Some(2L), None).toDF("k")
    val out = Enrich.enrich(facts, "k", "v")(k => Some(s"n$k"))
      .orderBy("k").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        Option(r.getString(1))))
    assert(out.toSet == Set((-1L, None), (1L, Some("n1")), (2L, Some("n2"))))
  }

  test("a fact column literally named 'key' survives enrichment") {
    val facts = Seq(("k1", "keep-me"), ("k2", "me-too"))
      .toDF("id", "key")
    val out = Enrich.enrich(facts, "id", "v")(k => Some(k.toUpperCase))
      .orderBy("id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("keep-me", "me-too"))
    assert(out.map(_.getString(2)).toSeq == Seq("K1", "K2"))
  }

  test("per-task init runs setup once per partition (connection reuse)") {
    EnrichSpecService.reset()
    val inits = new AtomicInteger(0)
    val keys = (1 to 40).map(i => s"k$i").toDF("k").repartition(4)
    val lut = Enrich.lookupTableWith(keys, "k") { () =>
      inits.incrementAndGet(); k => Some(k.toUpperCase)
    }
    assert(lut.count() == 40)
    // one init per non-empty task, bounded by partition count — never
    // one per key
    assert(inits.get() <= 4, s"init ran ${inits.get()} times")
  }
}
