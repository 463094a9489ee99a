package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over two `ARRAY<FLOAT>` columns with double
  * accumulation.
  *
  * Rationale (SURVEY.md §4.2 preference order): the composable form —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is correct but Spark's
  * higher-order functions evaluate their lambdas interpreted, per element,
  * and materialize the zipped intermediate array. For the ANN hot path
  * (O(queries × candidates × dim) multiply-adds) that interpretation
  * overhead dominates, so this is the one operator where a native
  * `Expression` with `doGenCode` is warranted: a tight primitive loop over
  * the two float arrays, no allocation, whole-stage-codegen friendly.
  * Accumulation order (left-to-right) is identical to the HOF form, so
  * results are bit-identical and the DuckDB oracle parity is unchanged.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"float_dot expects two ARRAY<FLOAT> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: with non-nullable inputs nullSafeCodeGen emits no
      // enclosing braces, so a projection evaluating several FloatDotProducts
      // (e.g. the 8 hyperplane projections in Similarity.hyperplaneBuckets)
      // would declare duplicate Java locals → Janino failure → silent
      // interpreted fallback.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Dot product of two ARRAY<FLOAT> columns → DOUBLE. */
  def float_dot(a: Column, b: Column): Column =
    GraftShim.column(FloatDotProduct(
      GraftShim.expression(a), GraftShim.expression(b)))

  /** L2 norm of an ARRAY<FLOAT> column → DOUBLE. */
  def float_norm(a: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    sqrt(float_dot(a, a))
  }

  /** Make `float_dot` callable from SQL in an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShim.registerFunction(spark, "float_dot",
      exprs => FloatDotProduct(exprs.head, exprs(1)))
}

/** `spark.sql.extensions` entry point for cluster-wide registration of
  * BOTH custom codegen expressions:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatDotProduct].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDotProduct(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("sorted_intersect_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[SortedLongIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedLongIntersectCount(exprs.head, exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("poly_fold"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyFold].getName, "poly_fold"),
      (exprs: Seq[Expression]) => TextHash.builder(exprs)))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("nearest_cells"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NearestCenterOrder].getName, "nearest_cells"),
      (exprs: Seq[Expression]) => NearestCenterOrder(exprs.head, exprs(1), exprs(2))))
  }
}
