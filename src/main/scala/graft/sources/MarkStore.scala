package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipelines.MongoMarksPipeline

/** Server-side pushdown contract for a live mark/analysis store — the
  * S-side seam the reference fills with a live MongoDB client
  * (mongo-etl/utils/mongo_client.py:1-131; query construction
  * mongodb_to_rdf.py:503-515). The engine ships an offline JSONL
  * implementation; a production connector implements this trait over
  * its own wire protocol and registers under a format name — no
  * pipeline code changes. The same wire protocol is ALSO exposed as a
  * DataSource V2 connector (`MarkSocketDataSource`) where Catalyst
  * plans the pushdown itself — prefer that seam for SQL/DataFrame
  * users; this trait remains the minimal contract for pipelines that
  * pass pushdown explicitly.
  *
  * The pushdown parameters mirror exactly what the reference pushes
  * into `find()`:
  *  - `startFromId` → `{_id: {$gte: start_from}}` (T4/P11 restart);
  *  - `executionIds` → `{execution_id: {$in: [...]}}` (S5 batched
  *    fetch by key list).
  * Implementations MUST return frames already satisfying the
  * predicates — a live store evaluates them server-side so only
  * matching documents cross the wire; the JSONL store applies them as
  * Spark filters, where Catalyst at least prunes columns/files.
  * Returned frames conform to `MongoMarksPipeline.markSchema` /
  * `analysisSchema`.
  */
trait MarkStore {
  def marks(spark: SparkSession,
    startFromId: Option[String] = None,
    executionIds: Option[Seq[String]] = None): DataFrame
  def analyses(spark: SparkSession,
    startFromId: Option[String] = None,
    executionIds: Option[Seq[String]] = None): DataFrame
}

/** Offline JSONL-backed store (the test/bench stand-in): explicit
  * schemas (no inference pass over 4M documents), pushdown applied as
  * engine-side filters. */
final class JsonlMarkStore(options: Map[String, String]) extends MarkStore {
  private def opt(k: String): String = options.getOrElse(k,
    throw new IllegalArgumentException(s"JsonlMarkStore: missing option '$k'"))

  private def applyPushdown(df: DataFrame, idCol: String, execCol: String,
    startFromId: Option[String], executionIds: Option[Seq[String]])
    : DataFrame = {
    val afterStart = startFromId.fold(df)(s => df.filter(col(idCol) >= s))
    executionIds.fold(afterStart)(ids =>
      afterStart.filter(col(execCol).isin(ids: _*)))
  }

  override def marks(spark: SparkSession, startFromId: Option[String],
    executionIds: Option[Seq[String]]): DataFrame =
    applyPushdown(
      MongoMarksPipeline.readMarks(spark, opt("marks.path")),
      "_id", "provenance.analysis.execution_id", startFromId, executionIds)

  override def analyses(spark: SparkSession, startFromId: Option[String],
    executionIds: Option[Seq[String]]): DataFrame =
    applyPushdown(
      MongoMarksPipeline.readAnalyses(spark, opt("analyses.path")),
      "_id", "analysis.execution_id", startFromId, executionIds)
}

/** Format registry, DataFrameReader-style: `MarkStores("jsonl",
  * Map("marks.path" -> …))`. A connector jar registers its factory at
  * startup (`MarkStores.register("mongodb", opts => new MongoStore(
  * opts))`) and pipelines switch stores by name+options only. */
object MarkStores {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[
      String, Map[String, String] => MarkStore]()

  register("jsonl", opts => new JsonlMarkStore(opts))
  register("socket", opts => new SocketMarkStore(opts))

  def register(format: String,
    factory: Map[String, String] => MarkStore): Unit =
    registry.put(format.toLowerCase, factory)

  def formats: Set[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet.asScala.toSet
  }

  def apply(format: String, options: Map[String, String]): MarkStore =
    Option(registry.get(format.toLowerCase)).map(_(options)).getOrElse(
      throw new IllegalArgumentException(
        s"unknown mark-store format '$format'; " +
          s"registered: ${formats.mkString(", ")}"))
}
