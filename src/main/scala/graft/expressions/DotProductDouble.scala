package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: `graft_dot(a, b)` — the dot product of
  * two numeric arrays, each element promoted to double, accumulated
  * left-to-right (index order). This is the engine's one custom
  * codegen'd kernel (SURVEY §7.3's "custom Expression" tier): the HOF
  * spelling `aggregate(zip_with(a, b, (x,y) -> ...), 0D, +)` evaluates
  * its lambda interpreted per element; this expression generates a
  * tight Java loop inside whole-stage codegen instead.
  *
  * Semantics (fixed for oracle parity):
  *  - fold order = index order, accumulator starts at 0.0 — identical
  *    IEEE result to the mirrored DuckDB list_reduce oracle;
  *  - null array, length mismatch, or null element → null (matching
  *    what the zip_with/aggregate spelling would produce).
  */
case class DotProductDouble(left: Expression, right: Expression)
  extends BinaryExpression {

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of numeric type, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  private def toDouble(arr: ArrayData, i: Int, t: DataType): Double =
    t match {
      case DoubleType => arr.getDouble(i)
      case FloatType => arr.getFloat(i).toDouble
      case LongType => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case ShortType => arr.getShort(i).toDouble
      case ByteType => arr.getByte(i).toDouble
      case d: DecimalType => arr.getDecimal(i, d.precision, d.scale).toDouble
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = aa.numElements()
    if (n != bb.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (aa.isNullAt(i) || bb.isNullAt(i)) return null
      sum += toDouble(aa, i, lt) * toDouble(bb, i, rt)
      i += 1
    }
    sum
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (lt, rt) = (elemType(left), elemType(right))
    // Decimal elements arrive as o.a.s.sql.types.Decimal objects — a
    // `(double)` cast on them is invalid Java and would fail the whole
    // enclosing codegen stage; call .toDouble() instead.
    def asDouble(v: String, t: DataType): String = t match {
      case _: DecimalType => s"$v.toDouble()"
      case _ => s"(double)($v)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val getA = asDouble(CodeGenerator.getValue(a, lt, i), lt)
      val getB = asDouble(CodeGenerator.getValue(b, rt, i), rt)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $sum += $getA * $getB;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): DotProductDouble =
    copy(left = newLeft, right = newRight)
}

/** Session registration for the graft expression family — idempotent,
  * callable on any session (the driver may hand us one it built). Also
  * usable via `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
object GraftFunctions {
  /** Arity-checked builder: a wrong-arity SQL call must surface as a
    * proper analysis error, not an IndexOutOfBoundsException from
    * `exprs(1)`. */
  private[expressions] def binary(name: String,
    make: (Expression, Expression) => Expression)
    : Seq[Expression] => Expression = {
    case Seq(a, b) => make(a, b)
    case exprs => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map("functionName" -> name,
        "expectedNum" -> "2", "actualNum" -> exprs.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", binary("graft_dot", DotProductDouble(_, _)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_l2sq", binary("graft_l2sq", SquaredL2Long(_, _)),
      "built-in")
    // idempotent: extraOptimizations is tiny, guard by identity
    Seq(BoundLevenshtein, graft.plans.TopKRewrite,
      graft.plans.GroupedTopKPushdown).foreach { r =>
      if (!spark.experimental.extraOptimizations.contains(r))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ r
    }
    graft.plans.GroupedTopK.ensureRegistered(spark)
  }
}

/** `--conf spark.sql.extensions=graft.expressions.GraftExtensions`. */
class GraftExtensions
  extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(
    ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProductDouble].getName, "graft_dot"),
      GraftFunctions.binary("graft_dot", DotProductDouble(_, _))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_l2sq"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SquaredL2Long].getName, "graft_l2sq"),
      GraftFunctions.binary("graft_l2sq", SquaredL2Long(_, _))))
    ext.injectOptimizerRule(_ => BoundLevenshtein)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKPushdown)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
