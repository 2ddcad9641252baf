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

  test("PNG encode→decode round trip is pixel-exact (real ImageIO)") {
    val payload = "hello multimodal world!".getBytes("UTF-8")
    val png = Multimodal.encodeGrayPng(payload, width = 8)
    // it is a real PNG (magic bytes), not the payload echoed back
    assert(png.take(8).toSeq ==
      Seq(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 8 && img.getHeight == 3) // ceil(23/8)
    val pixels = for (y <- 0 until 3; x <- 0 until 8)
      yield img.getRaster.getSample(x, y, 0)
    assert(pixels.take(23) == payload.map(_ & 0xff).toSeq)
    assert(pixels.drop(23).forall(_ == 0)) // zero padding
  }

  test("ImageCodec non-PNG fallback: a BMP payload still decodes (r21)") {
    // r21's per-task ImageCodec reuses one PNG reader; anything else
    // must fall back to the ImageIO registry lookup. Exercise that
    // branch with a real BMP through the full Dataset path.
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val vals = Seq(5, 10, 15, 20, 25, 30)
    vals.zipWithIndex.foreach { case (v, i) =>
      img.getRaster.setSample(i % 3, i / 3, 0, v) }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val m = Media(9L, "image/bmp", bos.toByteArray, 3, 2)
    val out = Multimodal.decodeImageFeatures(Seq(m).toDS()).collect()
    assert(out.length == 1)
    assert(out.head.width == 3 && out.head.height == 2)
    assert(out.head.px_sum == vals.sum && out.head.px_max == vals.max)
  }

  test("PNG codec property: random payloads round-trip pixel-exact") {
    import org.scalacheck.Gen
    var seed = org.scalacheck.rng.Seed(7L)
    val gen = for {
      n <- Gen.choose(1, 400)
      bytes <- Gen.listOfN(n, Gen.choose(0, 255))
      w <- Gen.choose(1, 32)
    } yield (bytes.map(_.toByte).toArray, w)
    (0 until 40).foreach { _ =>
      val (payload, w) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Multimodal.encodeGrayPng(payload, w)))
      val h = (payload.length + w - 1) / w
      assert(img.getWidth == w && img.getHeight == h)
      val pixels = for (y <- 0 until h; x <- 0 until w)
        yield img.getRaster.getSample(x, y, 0)
      assert(pixels.take(payload.length) == payload.map(_ & 0xff).toSeq)
      assert(pixels.drop(payload.length).forall(_ == 0))
    }
  }

  test("decodeImageFeatures runs real decode over a Dataset") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) > 0)
    val feats = Multimodal.decodeImageFeatures(
      Multimodal.imagesFromDocuments(docs, width = 16))
      .collect().map(f => f.media_id -> f).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feats.keySet == texts.keySet)
    for ((id, t) <- texts.take(20)) {
      val bytes = t.getBytes("UTF-8").map(_ & 0xff)
      assert(feats(id).width == 16)
      assert(feats(id).height == (bytes.length + 15) / 16)
      assert(feats(id).px_sum == bytes.map(_.toLong).sum)
      assert(feats(id).px_max == bytes.max)
    }
    // non-image media is rejected, not silently stub-decoded
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeImageFeatures(
        Multimodal.mediaFromDocuments(docs)).collect()
    }
  }

  test("encodePcmWav → javax.sound decode round-trips sample-exact") {
    val payload = Array[Byte](0, 64, 127, -128, -1) // unsigned 0..255
    val wav = Multimodal.encodePcmWav(payload, 8000)
    // a genuine RIFF/WAVE container, parseable by the JDK
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate == 8000f)
    assert(ais.getFormat.getChannels == 1)
    val pcm = ais.readAllBytes()
    val samples = pcm.grouped(2).map(p =>
      (p(1).toInt << 8) | (p(0) & 0xff)).toSeq
    assert(samples == payload.map(b => ((b & 0xff) - 128) << 8).toSeq)
  }

  test("decodeAudioFeatures runs real WAV decode over a Dataset") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")) > 0)
    val feats = Multimodal.decodeAudioFeatures(
      Multimodal.audioFromDocuments(docs, sampleRate = 8000))
      .collect().map(f => f.media_id -> f).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(feats.keySet == texts.keySet)
    for ((id, t) <- texts.take(20)) {
      val amps = t.getBytes("UTF-8").map(b => ((b & 0xff) - 128).abs * 256)
      assert(feats(id).sample_rate == 8000)
      assert(feats(id).n_samples == amps.length.toLong)
      assert(feats(id).amp_sum == amps.map(_.toLong).sum)
      assert(feats(id).amp_max == amps.max)
    }
    // non-audio media is rejected, not silently stub-decoded
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioFeatures(
        Multimodal.mediaFromDocuments(docs)).collect()
    }
  }

  test("encodeY4m → decodeVideo round-trips frame/luma stats exactly") {
    // 100 bytes at 6×4 = 24/frame → 5 frames, 20 padding zeros
    val payload = (1 to 100).map(_.toByte).toArray
    val y4m = Multimodal.encodeY4m(payload, width = 6, height = 4)
    assert(new String(y4m.take(9), "US-ASCII") == "YUV4MPEG2")
    val f = Multimodal.decodeVideoFeatures(
      Seq(Media(7L, "video/x-yuv4mpeg", y4m, 6, 4)).toDS())
      .collect().head
    assert(f.width == 6 && f.height == 4)
    assert(f.n_frames == 5)
    assert(f.luma_sum == (1 to 100).sum.toLong)
    assert(f.luma_max == 100)
  }

  test("Y4M decoder skips chroma planes and FRAME parameters") {
    // hand-built 2×2 C420 stream: luma 4 bytes + chroma 2 bytes/frame;
    // second FRAME marker carries a parameter (spec-legal)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W2 H2 F30:1 C420\n".getBytes("US-ASCII"))
    bos.write("FRAME\n".getBytes("US-ASCII"))
    bos.write(Array[Byte](10, 20, 30, 40, 99, 99)) // chroma ≠ luma
    bos.write("FRAME Xparam\n".getBytes("US-ASCII"))
    bos.write(Array[Byte](50, 60, 70, 80, 99, 99))
    val f = Multimodal.decodeVideoFeatures(
      Seq(Media(1L, "video/x-yuv4mpeg", bos.toByteArray, 2, 2)).toDS())
      .collect().head
    assert(f.n_frames == 2)
    assert(f.luma_sum == (10 + 20 + 30 + 40 + 50 + 60 + 70 + 80).toLong)
    assert(f.luma_max == 80) // the 99s live in chroma, never counted
  }

  test("sampleVideoFrames extracts every stride-th frame's stats") {
    val payload = (0 until 64 * 7).map(i => (i % 101).toByte).toArray
    val y4m = Multimodal.encodeY4m(payload, 8, 8) // 7 frames exactly
    val frames = Multimodal.sampleVideoFrames(
      Seq(Media(3L, "video/x-yuv4mpeg", y4m, 8, 8)).toDS(), stride = 3)
      .collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 3, 6))
    val expect0 = (0 until 64).map(i => (i % 101).toLong).sum
    assert(frames.head.luma_sum == expect0)
  }

  test("Y4M decoder fails loudly on truncation and bad markers") {
    val good = Multimodal.encodeY4m((1 to 64).map(_.toByte).toArray, 8, 8)
    val truncated = good.dropRight(10)
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoFeatures(
        Seq(Media(1L, "video/x-yuv4mpeg", truncated, 8, 8)).toDS())
        .collect()
    }
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoFeatures(
        Seq(Media(2L, "video/x-yuv4mpeg",
          "YUV4MPEG2 W8 H8\nBOGUS\n".getBytes("US-ASCII"), 8, 8)).toDS())
        .collect()
    }
    // non-video media is rejected, not silently stub-decoded
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoFeatures(
        Seq(Media(3L, "image/png", good, 8, 8)).toDS()).collect()
    }
    // high-bit-depth colorspaces (2 bytes/sample) must be rejected,
    // not sized as 8-bit — a prefix match would walk into mid-plane
    val p10 = ("YUV4MPEG2 W2 H2 C420p10\n" + "FRAME\n").getBytes(
      "US-ASCII") ++ new Array[Byte](12) // 2×2 C420 at 10-bit = 12 B
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideoFeatures(
        Seq(Media(4L, "video/x-yuv4mpeg", p10, 2, 2)).toDS()).collect()
    }
  }

  test("Y4M headers with Int-overflowing dimensions fail the PARSER " +
    "loudly — no zero-size frame walk, no raw AIOOBE") {
    def ex(header: String): Throwable = {
      val bytes = (header + "FRAME\n").getBytes("US-ASCII") ++
        new Array[Byte](64)
      intercept[org.apache.spark.SparkException] {
        Multimodal.decodeVideoFeatures(
          Seq(Media(9L, "video/x-yuv4mpeg", bytes, 8, 8)).toDS())
          .collect()
      }
    }
    // 65536×65536 mono: w*h wraps Int to 0 — would loop forever over
    // zero-length "frames" counting garbage
    val zero = ex("YUV4MPEG2 W65536 H65536 Cmono\n")
    assert(zero.getMessage.contains("exceeds the maximum"), zero)
    // 46341×46341 default 420: luma wraps negative — would drive the
    // walk's position negative into ArrayIndexOutOfBounds
    val neg = ex("YUV4MPEG2 W46341 H46341\n")
    assert(neg.getMessage.contains("exceeds the maximum"), neg)
  }

  test("resizeImageNearest tags output PNG bytes as image/png " +
    "regardless of the input's type tag") {
    val docs = Seq((1L, "hello resize world")).toDF("doc_id", "text")
    val retagged = Multimodal.imagesFromDocuments(docs, width = 4)
      .map(m => m.copy(media_type = "image/x-test"))
    val out = Multimodal.resizeImageNearest(retagged, factor = 2)
      .collect().head
    assert(out.media_type == "image/png", out.media_type)
    // …and the bytes really are PNG
    assert((out.content(0) & 0xff) == 0x89 &&
      new String(out.content.slice(1, 4), "US-ASCII") == "PNG")
  }

  // ---- mutation-set-4 survivor pins (tools/mutation_sample.py D*):
  // each of these is a spec gap the seeded-mutant pass exposed —
  // six of the eight sit where the m1–m6 oracle face cannot see
  // (stub frame counting, stride byte signedness, resizeStub dims,
  // the stereo guard, Y4M default colorspace, C422 sizing).

  test("decodeStub n_frames is FLOOR of bytes/stride (sub-stride " +
    "payloads report 0 frames, not 1) [pins D2-frames-ceil]") {
    val out = Multimodal.extractFeatures(media.toDS(), frameStride = 1024)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_frames == 0) // 4 bytes / 1024 — floor, not ceil
    val odd = Seq(Media(9L, "video/fake",
      new Array[Byte](2500), 0, 0)).toDS()
    assert(Multimodal.extractFeatures(odd, 1024)
      .collect().head.n_frames == 2) // floor(2500/1024)
  }

  test("decodeStub mean rounds HALF-UP, not floor [pins D1-mean-floor]") {
    val ds = Seq(Media(9L, "text/plain",
      Array[Byte](1, 1, 0), 0, 0)).toDS() // mean 2/3 → 6666.67
    assert(Multimodal.extractFeatures(ds, 1024)
      .collect().head.mean_byte_e4 == 6667L)
  }

  test("sampleFrames emits UNSIGNED byte values for high bytes " +
    "[pins D3-sign-mask]") {
    val hi = Seq(Media(9L, "video/fake",
      Array[Byte](-56, 0, -1), 0, 0)).toDS() // 0xC8, 0x00, 0xFF
    val frames = Multimodal.sampleFrames(hi, stride = 1)
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(frames.toSeq == Seq((0, 200), (1, 0), (2, 255)))
  }

  test("resizeStub dims use CEILING division — never 0×0 for a " +
    "nonempty payload [pins D4-resize-floor]") {
    val odd = Seq(Media(9L, "image/fake",
      Array[Byte](1, 2, 3), 3, 1)).toDS()
    val out = Multimodal.resizeStub(odd, factor = 2).collect().head
    assert(out.width == 2 && out.height == 1) // ceil(3/2), ceil(1/2)
    assert(out.content.toSeq == Seq[Byte](1, 3))
  }

  test("decodeAudio rejects stereo WAVs loudly [pins D8-audio-mono-guard]") {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](64) // 16 stereo frames of silence
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 16L)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeAudioFeatures(
        Seq(Media(9L, "audio/wav", bos.toByteArray, 0, 0)).toDS())
        .collect()
    }
  }

  test("Y4M stream with NO C tag defaults to 420jpeg chroma sizing " +
    "[pins D9-y4m-default-cs]") {
    // 2×2, no C tag: luma 4 + default-420 chroma 2 = 6 bytes/frame
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W2 H2 F25:1\n".getBytes("US-ASCII"))
    bos.write("FRAME\n".getBytes("US-ASCII"))
    bos.write(Array[Byte](10, 20, 30, 40, 99, 99))
    bos.write("FRAME\n".getBytes("US-ASCII"))
    bos.write(Array[Byte](1, 2, 3, 4, 99, 99))
    val f = Multimodal.decodeVideoFeatures(
      Seq(Media(9L, "video/x-yuv4mpeg", bos.toByteArray, 2, 2)).toDS())
      .collect().head
    assert(f.n_frames == 2)
    assert(f.luma_sum == (10 + 20 + 30 + 40 + 1 + 2 + 3 + 4).toLong)
    assert(f.luma_max == 40) // the 99s live in default chroma
  }

  test("C422 chroma is sized 2·ceil(w/2)·h, not like C420 " +
    "[pins D10-y4m-422-as-420]") {
    // 2×2 C422: luma 4 + chroma 2·1·2 = 4 → 8 bytes/frame
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("YUV4MPEG2 W2 H2 C422\n".getBytes("US-ASCII"))
    bos.write("FRAME\n".getBytes("US-ASCII"))
    bos.write(Array[Byte](10, 20, 30, 40, 99, 99, 99, 99))
    bos.write("FRAME\n".getBytes("US-ASCII"))
    bos.write(Array[Byte](5, 6, 7, 8, 99, 99, 99, 99))
    val f = Multimodal.decodeVideoFeatures(
      Seq(Media(9L, "video/x-yuv4mpeg", bos.toByteArray, 2, 2)).toDS())
      .collect().head
    assert(f.n_frames == 2)
    assert(f.luma_sum == (10 + 20 + 30 + 40 + 5 + 6 + 7 + 8).toLong)
    assert(f.luma_max == 40)
  }

  test("resizeImageNearest SUBSAMPLES at (x·f, y·f) — not a crop " +
    "[pins D12-resize-crop]") {
    // 4×4 gray PNG with pixels 0..15 row-major
    val png = Multimodal.encodeGrayPng((0 until 16).map(_.toByte).toArray, 4)
    val out = Multimodal.resizeImageNearest(
      Seq(Media(9L, "image/png", png, 4, 4)).toDS(), factor = 2)
      .collect().head
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.content))
    assert(img.getWidth == 2 && img.getHeight == 2)
    val px = for (y <- 0 until 2; x <- 0 until 2)
      yield img.getRaster.getSample(x, y, 0)
    assert(px == Seq(0, 2, 8, 10)) // source (0,0),(2,0),(0,2),(2,2)
  }

  test("m1_binary_meta guards empty/null text like its siblings " +
    "(the oracle divides by len(text))") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("m1guard").toString
    graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(3)
      .unionByName(Seq((99999L, "", "en", "none", 0L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
        allowMissingColumns = true)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.MultimodalQueries
      .queries("m1_binary_meta")(spark, dir).collect()
    assert(got.length == 3, got.toSeq) // empty-text row excluded
    assert(!got.exists(_.getLong(0) == 99999L))
  }
}
