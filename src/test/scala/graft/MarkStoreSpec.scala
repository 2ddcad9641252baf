package graft

import graft.sources.{JsonlMarkStore, MarkStore, MarkStores}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

class MarkStoreSpec extends SparkTestBase {
  private val fx = "src/test/resources/fixtures/mongo"
  private val opts = Map(
    "marks.path" -> s"$fx/marks.jsonl",
    "analyses.path" -> s"$fx/analyses.jsonl")

  test("jsonl store reads schema'd marks and analyses via the registry") {
    val store = MarkStores("jsonl", opts)
    val marks = store.marks(spark)
    val analyses = store.analyses(spark)
    assert(marks.count() > 0 && analyses.count() > 0)
    assert(marks.schema == graft.pipelines.MongoMarksPipeline.markSchema)
    assert(analyses.schema ==
      graft.pipelines.MongoMarksPipeline.analysisSchema)
  }

  test("pushdown contract: start-from and execution-id filters hold") {
    val store = MarkStores("jsonl", opts)
    val all = store.marks(spark).select("_id")
      .collect().map(_.getString(0)).sorted
    assert(all.length >= 3)
    val from = all(1) // restart in the middle of the id range
    val rest = store.marks(spark, startFromId = Some(from))
      .select("_id").collect().map(_.getString(0)).sorted
    assert(rest.toSeq == all.drop(1).toSeq)

    val byExec = store.marks(spark,
      executionIds = Some(Seq("exec-does-not-exist")))
    assert(byExec.count() == 0)
    val hit = store.analyses(spark, executionIds = Some(Seq("exec-1")))
    assert(hit.count() > 0)
  }

  test("a live connector plugs in by name and receives the pushdown") {
    @volatile var pushedStart: Option[String] = None
    val fake = new MarkStore {
      def marks(s: SparkSession, startFromId: Option[String],
        executionIds: Option[Seq[String]]): DataFrame = {
        pushedStart = startFromId // a real store builds find() from this
        new JsonlMarkStore(opts).marks(s, startFromId, executionIds)
      }
      def analyses(s: SparkSession, startFromId: Option[String],
        executionIds: Option[Seq[String]]): DataFrame =
        new JsonlMarkStore(opts).analyses(s, startFromId, executionIds)
    }
    MarkStores.register("fake-live", _ => fake)
    assert(MarkStores.formats.contains("fake-live"))
    MarkStores("fake-live", Map.empty)
      .marks(spark, startFromId = Some("m-002")).count()
    assert(pushedStart == Some("m-002"))
  }

  test("unknown formats and missing options fail loudly") {
    val e = intercept[IllegalArgumentException] {
      MarkStores("no-such-store", Map.empty)
    }
    assert(e.getMessage.contains("jsonl"))
    intercept[IllegalArgumentException] {
      MarkStores("jsonl", Map.empty).marks(spark)
    }
  }
}
