package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Probe order of a vector against a centroid matrix: cell indices sorted
  * ascending by squared-distance surrogate `d(c) = c2[c] − 2·(v·center_c)`
  * (the row-constant `v·v` term is dropped — it can't change the order),
  * ties broken by the lower cell index.
  *
  * Inputs: `vec ARRAY<FLOAT>`, `centersFlat ARRAY<FLOAT>` (row-major
  * nCells×dim), `c2 ARRAY<DOUBLE>` (per-center `Σ center_i²`,
  * left-to-right accumulation). Output: `ARRAY<INT>` of length nCells —
  * `result[0]` is the nearest cell (IVF assignment), `slice(result, 1,
  * nprobe)` is the multi-probe set.
  *
  * Why a native expression (SURVEY.md §4.2 preference order): the
  * composable form — `array_sort` over nCells `struct(float_dot, cell)`
  * columns — is correct but builds an 80+-expression projection that costs
  * seconds of analysis + Janino compilation PER LLOYD ITERATION and
  * allocates nCells structs per row at runtime. This expression is one
  * plan node whose generated source is center-value-invariant (the matrix
  * ships as an array literal reference), so iterating Lloyd never
  * recompiles, and the hot path is two tight primitive loops (multiply-add
  * + insertion sort of ≤nCells ints) with a single `int[]` allocation.
  *
  * Distance math is bit-compatible with the composed form it replaces:
  * the dot product accumulates left-to-right in double over
  * `min(|vec|, dim)` elements exactly like [[FloatDotProduct]], and the
  * (d, cell) ordering matches `array_sort`'s lexicographic struct order
  * for NaN-free inputs (finite float inputs can't produce NaN here).
  */
case class NearestCenterOrder(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"nearest_cells expects (ARRAY<FLOAT>, ARRAY<FLOAT>, ARRAY<DOUBLE>), " +
          s"got ${a.sql}, ${b.sql}, ${c.sql}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(v: Any, ctr: Any, c2a: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val flat = ctr.asInstanceOf[ArrayData]
    val c2 = c2a.asInstanceOf[ArrayData]
    val nc = c2.numElements()
    val dim = if (nc == 0) 0 else flat.numElements() / nc
    val d = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val base = c * dim
      val n = math.min(vec.numElements(), dim)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += vec.getFloat(i).toDouble * flat.getFloat(base + i).toDouble
        i += 1
      }
      d(c) = c2.getDouble(c) - 2.0 * acc
      c += 1
    }
    val ord = Array.tabulate(nc)(identity)
    // insertion sort — stable, so equal distances keep ascending cell order
    var a = 1
    while (a < nc) {
      val t = ord(a); val dt = d(t)
      var b = a - 1
      while (b >= 0 && d(ord(b)) > dt) { ord(b + 1) = ord(b); b -= 1 }
      ord(b + 1) = t
      a += 1
    }
    UnsafeArrayData.fromPrimitiveArray(ord)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, flat, c2) => {
      // fresh locals: with non-nullable inputs nullSafeCodeGen emits no
      // enclosing braces (same pitfall as FloatDotProduct).
      val nc = ctx.freshName("nc")
      val dim = ctx.freshName("dim")
      val d = ctx.freshName("d")
      val ord = ctx.freshName("ord")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val t = ctx.freshName("t")
      val dt = ctx.freshName("dt")
      s"""
         |int $nc = $c2.numElements();
         |int $dim = ($nc == 0) ? 0 : $flat.numElements() / $nc;
         |double[] $d = new double[$nc];
         |for (int $c = 0; $c < $nc; $c++) {
         |  int $base = $c * $dim;
         |  int $n = java.lang.Math.min($vec.numElements(), $dim);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $vec.getFloat($i) * (double) $flat.getFloat($base + $i);
         |  }
         |  $d[$c] = $c2.getDouble($c) - 2.0 * $acc;
         |}
         |int[] $ord = new int[$nc];
         |for (int $c = 0; $c < $nc; $c++) $ord[$c] = $c;
         |for (int $a = 1; $a < $nc; $a++) {
         |  int $t = $ord[$a]; double $dt = $d[$t];
         |  int $b = $a - 1;
         |  while ($b >= 0 && $d[$ord[$b]] > $dt) { $ord[$b + 1] = $ord[$b]; $b--; }
         |  $ord[$b + 1] = $t;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($ord);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCenterOrder =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCells {
  /** Probe order of `vec` against a centroid matrix → ARRAY<INT>.
    * `c2` is computed here (per-center Σx², left-to-right double sum) so
    * callers can't pass a mismatched norm vector.
    */
  def nearest_cells(vec: Column, centers: Array[Array[Float]]): Column = {
    import org.apache.spark.sql.functions.typedlit
    val flat = centers.flatten.toSeq
    val c2 = centers.map(_.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble)).toSeq
    GraftShim.column(NearestCenterOrder(
      GraftShim.expression(vec),
      GraftShim.expression(typedlit(flat)),
      GraftShim.expression(typedlit(c2))))
  }
}
