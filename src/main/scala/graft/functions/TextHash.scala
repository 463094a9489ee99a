package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The 31-ary polynomial codepoint fold shared by MinHash, SimHash and the
  * winnowing fingerprints (Dedup.polyFoldExpr's SQL form):
  * `acc_{i+1} = (31·acc_i + codepoint_i) mod p`.
  *
  * Rationale (SURVEY.md §4.2 preference order): the composable form —
  * `aggregate(transform(split(s, ''), c -> ascii(c)), 0, ...)` — evaluates
  * TWO interpreted lambdas per character and materializes the split array;
  * on the shingle-hash hot path (one fold per shingle × every document)
  * that interpretation dominates. This expression folds the string in one
  * static call that whole-stage codegen inlines. Semantics are identical
  * to the HOF form: Java's empty-regex split is codepoint-aware (surrogate
  * pairs stay whole) and Spark's `ascii` returns the first codepoint, so
  * both iterate codepoints — verified bit-for-bit in TextHashSpec, and the
  * DuckDB oracle replay (list_transform over string_split) is unchanged.
  */
object PolyFoldUtil {
  def fold(s: UTF8String, p: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % p
      i += Character.charCount(cp)
    }
    acc
  }
}

case class PolyFold(child: Expression, p: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_fold expects a STRING input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_fold"

  override def nullSafeEval(input: Any): Any =
    PolyFoldUtil.fold(input.asInstanceOf[UTF8String], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyFoldUtil.fold($c, ${p}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyFold =
    copy(child = newChild)
}

object TextHash {
  /** Polynomial codepoint fold of a STRING column mod `p` → BIGINT. */
  def poly_fold(c: Column, p: Long): Column =
    GraftShim.column(PolyFold(GraftShim.expression(c), p))

  /** SQL builder shared by `GraftExtensions` and [[register]]. A SQL integer
    * literal ≤ Int.MaxValue (e.g. the project's own P = 1000000007) evaluates
    * to a boxed Integer, not Long — accept any foldable numeric modulus and
    * fail analysis loudly otherwise.
    */
  def builder(exprs: Seq[Expression]): PolyFold = {
    def fail(msg: String) = throw new org.apache.spark.sql.AnalysisException(
      "USER_RAISED_EXCEPTION", Map("errorMessage" -> msg))
    if (exprs.length != 2)
      fail(s"poly_fold expects 2 arguments (str, modulus), got ${exprs.length}")
    if (!exprs(1).foldable)
      fail("poly_fold modulus must be a foldable numeric literal")
    val p = exprs(1).eval() match {
      case n: java.lang.Number => n.longValue()
      case other => fail(s"poly_fold modulus must be numeric, got $other")
    }
    PolyFold(exprs.head, p)
  }

  /** Make `poly_fold` callable from SQL in an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShim.registerFunction(spark, "poly_fold", builder)
}
