package graft

import graft.operators.BpeMerges
import org.apache.spark.sql.functions._

/** Pins BpeMerges' replace-on-boundary-encoding merge application and
  * full multi-round induction against a STRAIGHT-LINE Scala reference
  * (the index-walking greedy merge every BPE paper describes) — the
  * proof obligation for lifting the old 2-round / single-char-pair
  * cap: round >= 3 applies merges whose pair elements are themselves
  * merged multi-char symbols. */
class BpeMergesSpec extends SparkTestBase {

  /** Reference greedy left-to-right non-overlapping merge. */
  private def greedy(syms: Vector[String], a: String,
    b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Reference induction: count pairs, pick (cnt desc, a, b)-first,
    * merge, repeat. Returns (round, rnk, a, b, cnt) rows. */
  private def refLearn(words: Seq[String], rounds: Int,
    topK: Int): Seq[(Long, Long, String, String, Long)] = {
    var syms = words.map(_.toVector.map(_.toString))
    val rows = Vector.newBuilder[(Long, Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = syms.flatMap(s => s.zip(s.drop(1)))
        .groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      val ordered = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
      ordered.take(topK).zipWithIndex.foreach {
        case (((a, b), c), i) =>
          rows += ((r.toLong, (i + 1).toLong, a, b, c))
      }
      if (r < rounds) ordered.headOption.foreach { case ((a, b), _) =>
        syms = syms.map(greedy(_, a, b))
      }
    }
    rows.result()
  }

  /** Evaluate encode → applyMerge* → symbols for one word through the
    * engine (as literal columns — exactly the codegen'd expressions
    * the query runs). */
  private def applied(word: String,
    merges: Seq[(String, String)]): Vector[String] = {
    val enc = merges.foldLeft(BpeMerges.encode(lit(word)))(
      (e, m) => BpeMerges.applyMerge(e, lit(m._1), lit(m._2)))
    spark.range(1).select(BpeMerges.symbols(enc).as("s"))
      .collect().head.getSeq[String](0).toVector
  }

  private def refApplied(word: String,
    merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.toVector.map(_.toString))(
      (s, m) => greedy(s, m._1, m._2))

  test("single merge equals the straight-line greedy: runs and adjacency") {
    // overlapping run: only non-overlapping left-to-right pairs merge
    assert(applied("aaaa", Seq(("a", "a"))) == Vector("aa", "aa"))
    assert(applied("aaa", Seq(("a", "a"))) == Vector("aa", "a"))
    // adjacent disjoint pairs BOTH merge (the consumed-separator trap)
    assert(applied("abab", Seq(("a", "b"))) == Vector("ab", "ab"))
    assert(applied("", Seq(("a", "b"))) == Vector.empty)
    assert(applied("x", Seq(("a", "b"))) == Vector("x"))
  }

  test("multi-char pairs merge whole symbols, never raw substrings") {
    // (a,b) then (ab,c): the merged symbol is a pair ELEMENT
    assert(applied("abc", Seq(("a", "b"), ("ab", "c"))) ==
      Vector("abc"))
    // (b,c) first: "abc" is now [a, bc]; pair (ab, c) must NOT fire
    // even though the raw substring "abc" = "ab"+"c" exists
    assert(applied("xabc", Seq(("b", "c"), ("ab", "c"))) ==
      Vector("x", "a", "bc"))
    // chains of merged symbols: (a,b), (ab,ab)
    assert(applied("abab", Seq(("a", "b"), ("ab", "ab"))) ==
      Vector("abab"))
    // merged symbol as RIGHT element: (b,c), (a,bc)
    assert(applied("abcbc", Seq(("b", "c"), ("a", "bc"))) ==
      Vector("abc", "bc"))
  }

  test("pseudo-random words × merge chains match the reference") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    val words = Vector.fill(200)(
      Vector.fill(rnd.nextInt(9))(
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    // chains where later pairs reference earlier merged symbols
    val chains = Seq(
      Seq(("a", "b"), ("ab", "c"), ("a", "ab")),
      Seq(("b", "b"), ("bb", "bb"), ("a", "bbbb")),
      Seq(("c", "a"), ("ca", "ca"), ("b", "c")),
      Seq(("a", "a"), ("aa", "a"), ("aa", "aa")))
    for (chain <- chains; w <- words)
      assert(applied(w, chain) == refApplied(w, chain),
        s"word '$w' chain $chain")
  }

  test("applied() tokenizes with the learned vocab like the reference") {
    import spark.implicits._
    val words = Seq.fill(30)("then") ++ Seq.fill(20)("the") ++
      Seq.fill(12)("thin") ++ Seq.fill(7)("net") ++ Seq("a", "thethe")
    // reference: learn 3 merges straight-line, apply them, count
    var syms = words.map(_.toVector.map(_.toString))
    for (_ <- 1 to 3) {
      val counts = syms.flatMap(s => s.zip(s.drop(1)))
        .groupBy(identity).map { case (p, xs) => (p, xs.size.toLong) }
      val (a, b) = counts.toSeq
        .sortBy { case ((x, y), c) => (-c, x, y) }.head._1
      syms = syms.map(greedy(_, a, b))
    }
    val wantWords = syms.size.toLong
    val wantSymbols = syms.map(_.size.toLong).sum
    val wantVocab = syms.flatten.distinct.size.toLong
    val got = graft.operators.BpeMerges
      .applied(words.toDF("word"), "word", nMerges = 3)
      .select(graft.operators.BpeMerges.symbols(col("enc")).as("s"),
        col("wcnt"))
    val stats = got.agg(sum(col("wcnt")), sum(size(col("s")).cast("long")
      * col("wcnt"))).collect().head
    assert(stats.getLong(0) == wantWords)
    assert(stats.getLong(1) == wantSymbols)
    val vocab = got.select(explode(col("s")).as("t"))
      .agg(countDistinct(col("t"))).collect().head.getLong(0)
    assert(vocab == wantVocab)
    graft.operators.Broadcasting.releaseAll()
  }

  test("4-round learn() on a corpus matches the straight-line inducer") {
    import spark.implicits._
    // skewed corpus: forces round-2+ pairs to contain merged symbols
    val words = Seq.fill(30)("then") ++ Seq.fill(20)("the") ++
      Seq.fill(12)("thin") ++ Seq.fill(7)("net") ++
      Seq.fill(5)("ten") ++ Seq("a", "i", "", "thethe")
    val got = BpeMerges.learn(words.toDF("word"), "word",
      rounds = 4, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3), r.getLong(4))).toSeq
    val want = refLearn(words, rounds = 4, topK = 3)
    assert(got == want, s"\ngot  $got\nwant $want")
    // sanity: some later-round pair element must be multi-char, or
    // this corpus proves nothing about the general path
    assert(got.exists { case (r, _, a, b, _) =>
      r >= 2 && (a.length > 1 || b.length > 1) })
    graft.operators.Broadcasting.releaseAll()
  }
}
