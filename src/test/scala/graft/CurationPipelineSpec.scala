package graft

import graft.operators.{Broadcasting, CurationPipeline}

class CurationPipelineSpec extends SparkTestBase {
  import spark.implicits._

  // one corpus doc per drop-reason, plus three survivors
  private val bench =
    Seq((100L, "src0", "alpha beta gamma delta epsilon zeta eta theta"))
  private val corpus = Seq(
    1L -> "the cat sat on a mat with a hat and the bat ran off quick",
    2L -> "el la el la perro gato casa sol luna mar rio pan",   // es
    3L -> "the the the the a a a a the a the a",                // low quality
    4L -> "the quick alpha beta gamma delta jump over a fence okay",
    5L -> "a bird flew over the tall tree and then a small bird sang",
    6L -> "a bird flew over the tall tree and then a small bird sang",
    7L -> "the red fox ran past a quiet barn and seven dogs chased it x",
    8L -> "the red fox ran past a quiet barn and seven dogs chased it y",
    9L -> "")                                                   // und
    .map { case (id, t) => (id, "src1", t) }
  private val docs = (bench ++ corpus).toDF("doc_id", "source", "text")

  private def tokens(t: String): Long =
    t.split(" ").count(_.nonEmpty).toLong

  test("every stage drops exactly its offender; survivors match") {
    val (kept, summary) = CurationPipeline.run(docs)
    try {
      val stages = summary.orderBy("stage")
        .as[(Long, Long, Long)].collect().toSeq
      val textOf = corpus.map(c => c._1 -> c._3).toMap
      def sum(ids: Set[Long]) = ids.toSeq.map(id => tokens(textOf(id))).sum
      val expected = Seq(
        (0L, 9L, sum(Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L))),
        (1L, 7L, sum(Set(1L, 3L, 4L, 5L, 6L, 7L, 8L))), // es + und out
        (2L, 6L, sum(Set(1L, 4L, 5L, 6L, 7L, 8L))),     // low quality out
        (3L, 5L, sum(Set(1L, 5L, 6L, 7L, 8L))),         // contaminated out
        (4L, 4L, sum(Set(1L, 5L, 7L, 8L))),             // exact dup out
        (5L, 3L, sum(Set(1L, 5L, 7L))))                 // near dup out
      assert(stages == expected, stages.toString)
      val ids = kept.select("doc_id").as[Long].collect().toSet
      assert(ids == Set(1L, 5L, 7L))
      // benchmark (src0) documents never enter the corpus
      assert(!ids.contains(100L))
    } finally Broadcasting.releaseAll()
  }

  test("summary rows survive a stage emptying the corpus") {
    val tiny = Seq((1L, "src1", "el la perro"), (2L, "src0", "x y z"))
      .toDF("doc_id", "source", "text")
    val (kept, summary) = CurationPipeline.run(tiny)
    try {
      val stages = summary.orderBy("stage")
        .as[(Long, Long, Long)].collect().toSeq
      assert(stages == Seq((0L, 1L, 3L), (1L, 0L, 0L), (2L, 0L, 0L),
        (3L, 0L, 0L), (4L, 0L, 0L), (5L, 0L, 0L)))
      assert(kept.count() == 0)
    } finally Broadcasting.releaseAll()
  }

  test("config gates: language set and quality floor apply") {
    val (kept, _) = CurationPipeline.run(docs,
      CurationPipeline.Config(langs = Set("es"), minScoreE4 = 0L))
    try {
      assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L))
    } finally Broadcasting.releaseAll()
    intercept[IllegalArgumentException](
      CurationPipeline.run(docs, CurationPipeline.Config(langs = Set())))
  }
}
