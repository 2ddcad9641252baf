package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.Media

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val media = Seq(
    Media(1L, "image/fake", Array[Byte](10, 20, 30, 40), 2, 2),
    Media(2L, "audio/fake", Array[Byte](), 0, 0),
    Media(3L, "video/fake", (0 until 4096).map(_.toByte).toArray, 8, 8))

  test("extractFeatures: deterministic stub decode via mapPartitions") {
    val out = Multimodal.extractFeatures(media.toDS(), frameStride = 1024)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == 4L)
    assert(out(1L).mean_byte_e4 == 250000L) // mean(10,20,30,40)=25
    assert(out(1L).sha256.length == 64)
    assert(out(2L).n_bytes == 0L && out(2L).mean_byte_e4 == 0L)
    assert(out(3L).n_frames == 4)
    // determinism: same input → same digest
    val again = Multimodal.extractFeatures(media.toDS(), 1024)
      .collect().map(f => f.media_id -> f.sha256).toMap
    assert(out.forall { case (k, v) => again(k) == v.sha256 })
  }

  test("sampleFrames strides through payload bytes") {
    val frames = Multimodal.sampleFrames(media.toDS(), stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(frames.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0, 10), (1L, 1, 30)))
    assert(frames.count(_._1 == 3L) == 2048)
  }

  test("resizeStub downsamples payload and dims deterministically") {
    val out = Multimodal.resizeStub(media.toDS(), factor = 2)
      .collect().map(m => m.media_id -> m).toMap
    assert(out(1L).content.toSeq == Seq[Byte](10, 30))
    assert(out(1L).width == 1 && out(1L).height == 1)
    assert(out(2L).content.isEmpty)
    assert(out(3L).content.length == 2048)
    intercept[IllegalArgumentException] {
      Multimodal.resizeStub(media.toDS(), 0)
    }
  }

  test("mediaFromDocuments builds typed binary media from text") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val ds = Multimodal.mediaFromDocuments(docs)
    val first = ds.filter(_.media_id == 0L).collect().head
    assert(first.media_type == "text/plain" && first.content.nonEmpty)
  }
}
