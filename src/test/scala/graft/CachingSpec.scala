package graft

import graft.operators.Caching
import org.apache.spark.storage.StorageLevel

/** Pins the corpus-cache storage-level seam (r22): default level is
  * Spark's MEMORY_AND_DISK, and the conf reroutes every
  * Caching.persistCorpus site without touching results. */
class CachingSpec extends SparkTestBase {
  import spark.implicits._

  test("default corpus storage level is MEMORY_AND_DISK") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    assert(Caching.corpusLevel(df) == StorageLevel.MEMORY_AND_DISK)
    val p = Caching.persistCorpus(df)
    try assert(p.storageLevel == StorageLevel.MEMORY_AND_DISK)
    finally p.unpersist()
  }

  test("conf reroutes the level; rows are level-independent") {
    val df = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    spark.conf.set(Caching.CorpusLevelKey, "MEMORY_AND_DISK_SER")
    try {
      val p = Caching.persistCorpus(df)
      try {
        assert(p.storageLevel == StorageLevel.MEMORY_AND_DISK_SER)
        assert(p.collect().map(r => (r.getLong(0), r.getLong(1)))
          .sorted.toSeq == Seq((1L, 2L), (3L, 4L)))
      } finally p.unpersist()
    } finally spark.conf.unset(Caching.CorpusLevelKey)
  }
}
