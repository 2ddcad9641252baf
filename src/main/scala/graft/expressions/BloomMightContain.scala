package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native bloom-membership probe: true iff every Kirsch–Mitzenmacher
  * bit (h1 + j·h2 mod m, j < numHashes) is set in `words`.
  *
  * The children are the two raw 64-bit content hashes of the key (the
  * same stock `xxhash64` expressions the DISTRIBUTED BUILD hashes
  * with — see BloomJoin.bitCols); this expression only reduces them
  * mod m and indexes the bit array, so probe bits are bit-identical
  * to build bits by construction.
  *
  * Why an expression and not `element_at(typedlit(words), …)`: a
  * 4M-bit filter is a 65 536-element array literal, and the Column
  * spelling embeds ONE COPY PER PROBE in the plan (4 probes × 2
  * filter branches in the anti join = 8 × 512 KiB of boxed longs).
  * Every optimizer-rule traversal re-hashes those literals and every
  * task deserializes millions of boxed elements — measured at seconds
  * per query before any row is read. Here the word array is a plain
  * JVM field: it never enters the expression tree (rules hash an
  * array REFERENCE), serializes once as a primitive block, and
  * codegen reads it through `references[…]` — whole-stage-friendly.
  *
  * Mod arithmetic: h1/h2 are floor-reduced mod m first (m ≤ 2^31 a
  * multiple of 64), so hm1 + j·hm2 stays below 2^36 — no overflow for
  * j ≤ 16, matching the pmod spelling in BloomJoin.bitCols exactly.
  */
case class BloomMightContain(left: Expression, right: Expression,
  words: Array[Long], numHashes: Int)
  extends BinaryExpression with Predicate {

  override def prettyName: String = "graft_bloom_might_contain"
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType &&
      words.nonEmpty && numHashes >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two long hash children, a non-empty word " +
        s"array and numHashes >= 1")

  // Array fields compare by reference in case-class equality — correct
  // here (both filter branches share one Bloom instance), but keep the
  // tree string from printing an opaque array ref.
  override def simpleString(maxFields: Int): String =
    s"$prettyName(${left.simpleString(maxFields)}, " +
      s"${right.simpleString(maxFields)}, bits=${words.length * 64L}, " +
      s"k=$numHashes)"

  @inline private def probe(h1: Long, h2: Long): Boolean = {
    val m = words.length * 64L
    val hm1 = java.lang.Math.floorMod(h1, m)
    val hm2 = java.lang.Math.floorMod(h2, m)
    var j = 0
    while (j < numHashes) {
      val bit = (hm1 + j * hm2) % m
      if (((words((bit >>> 6).toInt) >>> (bit & 63L)) & 1L) == 0L)
        return false
      j += 1
    }
    true
  }

  override def nullSafeEval(h1: Any, h2: Any): Any =
    probe(h1.asInstanceOf[Long], h2.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val m = ctx.freshName("m")
    val hm1 = ctx.freshName("hm1")
    val hm2 = ctx.freshName("hm2")
    val j = ctx.freshName("j")
    val bit = ctx.freshName("bit")
    nullSafeCodeGen(ctx, ev, (h1, h2) =>
      s"""
         |final long $m = ${words.length}L * 64L;
         |final long $hm1 = java.lang.Math.floorMod($h1, $m);
         |final long $hm2 = java.lang.Math.floorMod($h2, $m);
         |${ev.value} = true;
         |for (int $j = 0; $j < $numHashes; $j++) {
         |  final long $bit = ($hm1 + $j * $hm2) % $m;
         |  if ((($w[(int) ($bit >>> 6)] >>> ($bit & 63L)) & 1L) == 0L) {
         |    ${ev.value} = false; break;
         |  }
         |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
