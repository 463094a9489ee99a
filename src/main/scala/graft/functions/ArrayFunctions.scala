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

  /** `collect_list` over BIGINT with a HARD per-group buffer bound, as an
    * untyped-usable aggregate column. See [[BoundedLongList]].
    *
    * PRECONDITION: the input column must be non-null — the primitive Long
    * input encoder fails on NULLs where `collect_list` would skip them.
    * Filter nulls out first if the column is nullable.
    */
  def bounded_collect_list(c: Column, maxKeep: Int): Column =
    org.apache.spark.sql.functions.udaf(BoundedLongList(maxKeep)).apply(c)

  /** Make `sorted_intersect_count` callable from SQL in an existing
    * session (cluster-wide: GraftExtensions).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShim.registerFunction(spark, "sorted_intersect_count",
      exprs => SortedLongIntersectCount(exprs.head, exprs(1)))
}

/** Growable primitive buffer for [[BoundedLongList]]. */
final case class LongBuf(var xs: Array[Long], var n: Int)

/** `collect_list` over BIGINT with a HARD per-group buffer bound: at most
  * `maxKeep` elements are ever held per group, in arrival order.
  *
  * Rationale: plain `collect_list` accumulates the WHOLE group in one
  * non-spillable buffer — for inverted-index posting lists a stop-gram
  * shared by millions of documents OOMs a reducer before any downstream
  * size-cap filter runs. With `maxKeep = cap + 1`, a caller filtering
  * `size(list) <= cap` gets exactly the capped semantics (an overflowing
  * group surfaces as `cap + 1` and is dropped) while every reducer buffer
  * stays bounded. For kept groups nothing is dropped, so sorting the
  * result is fully deterministic; overflowing groups may keep an
  * arrival-order-dependent subset — callers must DISCARD those, never
  * consume their contents.
  */
case class BoundedLongList(maxKeep: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Long, LongBuf, Array[Long]] {
  import org.apache.spark.sql.{Encoder, Encoders}

  override def zero: LongBuf = LongBuf(Array.empty, 0)

  private def add(b: LongBuf, a: Long): LongBuf = {
    if (b.n < maxKeep) {
      if (b.n == b.xs.length) {
        val grown = new Array[Long](math.max(8, math.min(maxKeep, b.xs.length * 2)))
        System.arraycopy(b.xs, 0, grown, 0, b.n)
        b.xs = grown
      }
      b.xs(b.n) = a
      b.n += 1
    }
    b
  }

  override def reduce(b: LongBuf, a: Long): LongBuf = add(b, a)

  override def merge(x: LongBuf, y: LongBuf): LongBuf = {
    var i = 0
    while (i < y.n && x.n < maxKeep) { add(x, y.xs(i)); i += 1 }
    x
  }

  override def finish(b: LongBuf): Array[Long] = b.xs.take(b.n)

  override def bufferEncoder: Encoder[LongBuf] = Encoders.product[LongBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
