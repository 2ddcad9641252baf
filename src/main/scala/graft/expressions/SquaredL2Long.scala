package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: `graft_l2sq(a, b)` — the squared L2
  * distance Σ(aᵢ−bᵢ)² of two integral arrays in pure int64
  * arithmetic. The third member of the graft codegen kernel family
  * (graft_dot, graft_bloom_might_contain): the HOF spelling
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, +)` evaluates
  * its lambdas interpreted per element; this generates a tight Java
  * loop inside whole-stage codegen. KMeans' assignment stage — the
  * corpus × k hot loop — runs on it.
  *
  * Semantics (fixed for oracle parity):
  *  - exact integer arithmetic, order-free (addition of int64s);
  *    overflow wraps like Java long (callers bound magnitudes — e6
  *    quantized unit-ish vectors are ~1e6/element, safe to ~2e5 dims);
  *  - null array, length mismatch, or null element → null (matching
  *    the zip_with/aggregate spelling).
  */
case class SquaredL2Long(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_l2sq"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(LongType | IntegerType | ShortType | ByteType, _) =>
        true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of integral type, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def toLong(arr: ArrayData, i: Int, t: DataType): Long =
    t match {
      case LongType => arr.getLong(i)
      case IntegerType => arr.getInt(i).toLong
      case ShortType => arr.getShort(i).toLong
      case ByteType => arr.getByte(i).toLong
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var sum = 0L
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      val d = toLong(aa, i, lt) - toLong(bb, i, rt)
      sum += d * d
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lt, rt) = (elemType(left), elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val d = ctx.freshName("d")
      val getA = s"(long)(${CodeGenerator.getValue(a, lt, i)})"
      val getB = s"(long)(${CodeGenerator.getValue(b, rt, i)})"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sum = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    final long $d = $getA - $getB;
         |    $sum += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): SquaredL2Long =
    copy(left = newLeft, right = newRight)
}
