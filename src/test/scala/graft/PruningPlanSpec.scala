package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Plan-level pruning guarantees for the lake layouts the engine
  * writes (hive-partitioned trees, z-ordered files): filters and
  * joins must SKIP partitions at planning/run time, not scan-and-
  * discard — at 100 TB this is the difference between touching one
  * directory and touching all of them. These specs pin the plan
  * shapes so a config / layout regression fails here, not in a
  * production scan. */
class PruningPlanSpec extends SparkTestBase {

  private lazy val factDir: String = {
    val dir = Files.createTempDirectory("prune_fact").toString
    spark.range(0, 1000)
      .select(col("id"), pmod(col("id"), lit(10)).as("part"),
        (col("id") * 2).as("value"))
      .write.partitionBy("part").parquet(s"$dir/fact")
    s"$dir/fact"
  }

  test("static filter on the partition column reaches PartitionFilters") {
    val fact = spark.read.parquet(factDir)
    val plan = fact.filter(col("part") === 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      (plan.contains("(part#") || plan.contains("part = 3")),
      s"partition filter not pushed:\n$plan")
    // and it is NOT a post-scan filter on the data
    assert(!plan.contains("PushedFilters: [IsNotNull(part)"),
      s"partition column leaked into data filters:\n$plan")
    assert(fact.filter(col("part") === 3).count() == 100)
  }

  test("fact-dim join prunes partitions DYNAMICALLY (DPP)") {
    val fact = spark.read.parquet(factDir)
    // dim with a selective filter NOT statically known to the fact
    // side. Two details DPP requires, both worth knowing at 100 TB:
    //  - the dim key must match the partition column's READ type (int)
    //    exactly — a cast on the join key disqualifies the scan;
    //  - the dim must be a real source scan: a local Seq gets its
    //    Filter constant-folded into the LocalRelation, and with no
    //    surviving selective predicate the DPP rule declines.
    import spark.implicits._
    val dimDir = Files.createTempDirectory("prune_dim").toString
    Seq((3, "keep"), (7, "keep"), (4, "drop"))
      .toDF("part", "tag").write.parquet(s"$dimDir/dim")
    val dim = spark.read.parquet(s"$dimDir/dim")
      .filter(col("tag") === "keep")
    val joined = fact.join(dim, Seq("part"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    assert(joined.count() == 200)
  }
}
