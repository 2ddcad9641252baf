package graft

import graft.operators.Perceptron
import org.apache.spark.sql.Row

class PerceptronSpec extends SparkTestBase {
  import spark.implicits._

  /** Straight-line reference of the exact full-batch update. */
  private def refFit(rows: Seq[(Long, Seq[Long])], rounds: Int)
  : Seq[Long] = {
    val k = rows.head._2.size
    var w = Seq.fill(k)(0L)
    for (_ <- 1 to rounds) {
      val mis = rows.filter { case (y, x) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0L
      }
      val step = (0 until k).map(i =>
        mis.map { case (y, x) => y * x(i) }.sum)
      w = w.zip(step).map { case (a, b) => a + b }
    }
    w
  }

  // (y, [bias, x1, x2]) — y matches sign(x1 - 3), learnable with bias
  private val data: Seq[(Long, Seq[Long])] = Seq(
    (1L, Seq(1L, 5L, 2L)), (1L, Seq(1L, 7L, 1L)),
    (1L, Seq(1L, 4L, 9L)), (1L, Seq(1L, 6L, 4L)),
    (-1L, Seq(1L, 1L, 3L)), (-1L, Seq(1L, 2L, 8L)),
    (-1L, Seq(1L, 0L, 1L)), (-1L, Seq(1L, 2L, 2L)))

  private def df = data.map { case (y, x) => (y, x(0), x(1), x(2)) }
    .toDF("y", "bias", "x1", "x2")

  private val cols = Seq("bias", "x1", "x2")

  test("weights match the straight-line reference, rounds 1..4") {
    for (r <- 1 to 4) {
      val got = Perceptron.fit(df, cols, "y", r)
        .collect().head match {
        case Row(a: Long, b: Long, c: Long) => Seq(a, b, c)
      }
      assert(got == refFit(data, r), s"round $r diverged")
    }
  }

  test("weights are order- and partitioning-invariant") {
    val a = Perceptron.fit(df, cols, "y", 3).collect().head
    val b = Perceptron.fit(df.repartition(5), cols, "y", 3)
      .collect().head
    val c = Perceptron.fit(
      data.reverse.map { case (y, x) => (y, x(0), x(1), x(2)) }
        .toDF("y", "bias", "x1", "x2"), cols, "y", 3).collect().head
    assert(a == b && a == c)
  }

  test("confusion counts agree with reference predictions") {
    val rounds = 3
    val w = refFit(data, rounds)
    val preds = data.map { case (y, x) =>
      val s = x.zip(w).map { case (a, b) => a * b }.sum
      (y, if (s > 0) 1L else -1L)
    }
    val exp = (
      preds.count { case (y, p) => p == 1 && y == 1 }.toLong,
      preds.count { case (y, p) => p == 1 && y == -1 }.toLong,
      preds.count { case (y, p) => p == -1 && y == -1 }.toLong,
      preds.count { case (y, p) => p == -1 && y == 1 }.toLong)
    val got = Perceptron.confusion(df, cols, "y",
      Perceptron.fit(df, cols, "y", rounds))
      .select("tp", "fp", "tn", "fn")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == exp)
  }

  test("a separable threshold is learned (zero training error)") {
    // The FULL-batch rule can cycle near the boundary (unlike the
    // online perceptron, its convergence theorem does not apply
    // per-round), so this uses a wide-margin set — y = sign(x1 - 5)
    // — where the straight-line reference settles by round 8.
    val sep = Seq((1L, 1L, 9L), (1L, 1L, 8L), (1L, 1L, 10L),
      (-1L, 1L, 1L), (-1L, 1L, 2L), (-1L, 1L, 0L))
      .toDF("y", "bias", "x1")
    val got = Perceptron.confusion(sep, Seq("bias", "x1"), "y",
      Perceptron.fit(sep, Seq("bias", "x1"), "y", 8))
      .select("fp", "fn").as[(Long, Long)].collect().head
    assert(got == ((0L, 0L)),
      "perceptron failed to separate a separable set")
  }
}
