package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd intersection COUNT of two ascending-sorted `ARRAY<BIGINT>`
  * columns — a two-pointer merge: O(|a|+|b|), zero allocation.
  *
  * Rationale (SURVEY.md §4.2 preference order): the built-in
  * `size(array_intersect(a, b))` is correct but allocates and fills a hash
  * set PLUS the materialized intersection array per row. On the triangle
  * counting hot path (one intersection per edge — millions of rows, arrays
  * of ~hub-degree length) that allocation dominates; the merge loop needs
  * neither. Inputs MUST be sorted ascending (`sort_array`); duplicate
  * elements within an input are counted per matching pair position, so
  * feed set-valued arrays (adjacency lists are).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects two ARRAY<BIGINT> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var (i, j) = (0, 0)
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: with non-nullable inputs nullSafeCodeGen emits no
      // enclosing braces, so fixed names would collide (duplicate Java
      // declarations → Janino failure → silent interpreted fallback) if the
      // expression appears twice in one codegen scope.
      val (na, nb) = (ctx.freshName("na"), ctx.freshName("nb"))
      val (i, j, n) = (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("n"))
      val (x, y) = (ctx.freshName("x"), ctx.freshName("y"))
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0;
         |long $n = 0L;
         |while ($i < $na && $j < $nb) {
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x == $y) { $n++; $i++; $j++; }
         |  else if ($x < $y) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ArrayFunctions {
  /** Intersection count of two sorted ARRAY<BIGINT> columns → BIGINT. */
  def sorted_intersect_count(a: Column, b: Column): Column =
    GraftShim.column(SortedLongIntersectCount(
      GraftShim.expression(a), GraftShim.expression(b)))
}
