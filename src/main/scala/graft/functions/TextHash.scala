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

/** Distinct token-bigram hashes of a single-space-tokenized string, emitted
  * directly from the string's bytes.
  *
  * Replaces the composable form on the inverted-index hot path —
  * `array_distinct(transform(sequence(...), i -> concat(toks[i], ' ',
  * toks[i+1])))` + `xxhash64` — which materializes the split array, one
  * concatenated String PER BIGRAM, and an interpreted lambda per element.
  * A token bigram is a CONTIGUOUS byte range of the original string (from
  * the start of token i to the end of token i+1, one separator in between),
  * so each gram hashes in place with zero allocation; a scratch hash set
  * dedups per document. Tokenization matches `split(text, " ")` exactly:
  * single-space delimiter, empty tokens between consecutive spaces kept.
  * Hash values are engine-internal (the Jaccard counts they feed never
  * surface them), so xxhash64-of-substring needs no cross-engine replay.
  */
object BigramUtil {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def hashes(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    // token start offsets (relative): tokens are split on single ' ' bytes
    // (safe: multi-byte UTF-8 units never contain 0x20)
    var starts = new Array[Int](16)
    var nTok = 0
    def addStart(i: Int): Unit = {
      if (nTok == starts.length) starts = java.util.Arrays.copyOf(starts, nTok * 2)
      starts(nTok) = i; nTok += 1
    }
    addStart(0)
    var i = 0
    while (i < n) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte)
        addStart(i + 1)
      i += 1
    }
    if (nTok < 2) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[Long](nTok * 2)
    val out = new Array[Long](nTok - 1)
    var m = 0
    var t = 0
    while (t < nTok - 1) {
      val from = starts(t)
      // end of token t+1: next token's start - 1 (the separator), or n
      val to = if (t + 2 < nTok) starts(t + 2) - 1 else n
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, to - from, 42L)
      if (seen.add(h)) { out(m) = h; m += 1 }
      t += 1
    }
    new GenericArrayData(if (m == out.length) out else java.util.Arrays.copyOf(out, m))
  }
}

case class BigramHashes(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bigram_hashes expects a STRING input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bigram_hashes"

  override def nullSafeEval(input: Any): Any =
    BigramUtil.hashes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramUtil.hashes($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramHashes =
    copy(child = newChild)
}

object TextHash {
  /** Polynomial codepoint fold of a STRING column mod `p` → BIGINT. */
  def poly_fold(c: Column, p: Long): Column =
    GraftShim.column(PolyFold(GraftShim.expression(c), p))

  /** Distinct token-bigram xxhash64 values of a STRING column →
    * ARRAY<BIGINT> (see [[BigramUtil]]).
    */
  def bigram_hashes(c: Column): Column =
    GraftShim.column(BigramHashes(GraftShim.expression(c)))

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
      case d: org.apache.spark.sql.types.Decimal =>
        if (d.toBigDecimal.remainder(java.math.BigDecimal.ONE).signum != 0)
          fail(s"poly_fold modulus must be integral, got $d")
        d.toLong
      case f: java.lang.Double => // fractional literals truncate silently — reject
        if (f.doubleValue() != Math.floor(f.doubleValue()))
          fail(s"poly_fold modulus must be integral, got $f")
        f.longValue()
      case f: java.lang.Float =>
        if (f.floatValue() != Math.floor(f.floatValue()))
          fail(s"poly_fold modulus must be integral, got $f")
        f.longValue()
      case n: java.lang.Number => n.longValue()
      case other => fail(s"poly_fold modulus must be numeric, got $other")
    }
    PolyFold(exprs.head, p)
  }

  /** Make `poly_fold` callable from SQL in an existing session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftShim.registerFunction(spark, "poly_fold", builder)
}
