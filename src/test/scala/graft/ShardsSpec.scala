package graft

import graft.operators.Shards
import org.apache.spark.sql.functions._

class ShardsSpec extends SparkTestBase {
  import spark.implicits._

  private val tmpDir =
    java.nio.file.Files.createTempDirectory("graft_shards").toString

  test("assignment is deterministic and partitioning-invariant") {
    val docs = (1L to 500L).map(i => (i, s"doc$i")).toDF("id", "text")
    val a = Shards.assign(docs, "id", 8)
      .select("id", "shard", "pos").collect().toSet
    val b = Shards.assign(docs.repartition(13), "id", 8)
      .select("id", "shard", "pos").collect().toSet
    assert(a == b)
    val shards = a.map(_.getLong(1))
    assert(shards.forall(s => s >= 0 && s < 8) && shards.size == 8)
  }

  test("shards are roughly balanced for hash-distributed keys") {
    val docs = (1L to 4000L).map(Tuple1(_)).toDF("id")
    val counts = Shards.assign(docs, "id", 8)
      .groupBy("shard").count().as[(Long, Long)].collect().toMap
    // E[count]=500; md5 uniformity keeps shards within ±40%
    assert(counts.values.forall(c => c > 300 && c < 700), counts)
  }

  test("null keys fail loudly") {
    val docs = Seq(Some(1L), None).toDF("id")
    // local relations evaluate raise_error at fold time
    // (SparkRuntimeException); distributed plans wrap it in a
    // SparkException — accept either, require the loud message
    val e = intercept[Exception](Shards.assign(docs, "id", 4).collect())
    assert(e.getMessage != null && e.getMessage.contains("null key") ||
      e.getCause != null && e.getCause.getMessage.contains("null key"))
  }

  test("write emits one file per shard dir, same rows, stable order") {
    val docs = (1L to 300L).map(i => (i, s"t$i")).toDF("id", "text")
    val path = s"$tmpDir/out"
    Shards.write(docs, "id", 4, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
    assert(dirs.length == 4)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName}: ${files.length} files")
    }
    val back = spark.read.parquet(path)
    assert(back.count() == 300L)
    assert(back.select("id").as[Long].collect().toSet ==
      (1L to 300L).toSet)
    // in-shard order follows pos: re-reading one shard file yields
    // rows already sorted (parquet preserves write order)
    val shard0 = spark.read.parquet(s"$path/shard=0")
      .select("pos").as[Long].collect()
    assert(shard0.sameElements(shard0.sorted))
  }

  test("shard/pos column collisions are rejected") {
    val docs = Seq((1L, 2L)).toDF("id", "shard")
    intercept[IllegalArgumentException](Shards.assign(docs, "id", 4))
  }
}
