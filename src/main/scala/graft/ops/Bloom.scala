package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Replayable Bloom filter — the join-pruning sketch: membership tests
  * with zero false NEGATIVES and a bounded, deterministic false-POSITIVE
  * rate (Bloom, CACM 1970). The at-scale use is semi-join pruning: build
  * the filter over the small side's keys (a few KB whatever the key
  * count), broadcast it, and drop non-matching fact rows BEFORE the
  * shuffle — the same idea as Spark's own runtime row-group/bloom
  * pruning, here as an explicit, value-checked operator.
  *
  * Replayable like the HLL/CMS/histogram sketches ([[Sketches]]): bit
  * positions come from the affine family `((a_j·x + b_j) mod P) mod m`
  * over fixed literal constants, words are 32-bit patterns stored in
  * BIGINTs (shift counts stay ≤ 31 — no sign games on either engine),
  * and the build is one map-side-combinable `bit_or` per word. Merge =
  * word-wise OR (idempotent, commutative — an OR-semilattice), so
  * partition layout and duplicate keys cannot change the filter.
  *
  * A row passing [[mightContain]] is IN the filter's language — including
  * its false positives, which are a pure function of the constants and
  * the key sets; that is what lets the bloom_semi_join query hash-match
  * a DuckDB oracle replaying the identical arithmetic.
  */
object Bloom {

  /** Filter geometry: 2048 × 32-bit words = 65536 bits (8 KB), k = 5
    * probes → fp rate ≈ (1 − e^(−kn/m))^k; ~1e-5 at n = 1350 keys.
    */
  final val BloomWords = 2048
  final val BloomBitsPerWord = 32
  final val BloomK = 5
  private[graft] final val P = 2147483647L

  /** Probe constants (a_j, b_j) — fixed odd literals < P, shared with the
    * generated oracle SQL.
    */
  private[graft] val hashRows: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L),
    (1223106847L, 271828183L),
    (1431655765L, 141421357L),
    (1140671485L, 720720733L),
    (1406714885L, 918273645L))

  private def norm(keyCol: String): Column =
    (col(keyCol).cast("long") % P + P) % P

  private def bitPos(x: Column, j: Int, words: Int): Column = {
    val (a, b) = hashRows(j)
    ((lit(a) * x + lit(b)) % P) % (words.toLong * BloomBitsPerWord)
  }

  /** Build the filter over `keys(keyCol)`: output `(word_idx, word)` with
    * ≤ `words` rows — one combinable `bit_or` groupBy however many keys
    * stream through. Duplicate keys are free (OR is idempotent).
    */
  def build(keys: DataFrame, keyCol: String, words: Int = BloomWords,
      k: Int = BloomK): DataFrame = {
    require(k <= hashRows.size, s"at most ${hashRows.size} probes available")
    val x = norm(keyCol)
    val probes = (0 until k).map(j => bitPos(x, j, words))
    keys.select(explode(array(probes: _*)).as("__pos"))
      .select(expr(s"__pos div $BloomBitsPerWord").as("word_idx"),
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__pos % $BloomBitsPerWord AS INT))")
          .as("__bit"))
      .groupBy("word_idx").agg(expr("bit_or(__bit)").as("word"))
  }

  /** Keep the rows of `df` whose `keyCol` might be in the filter (all k
    * probed bits set). Rows must be DISTINCT (the membership verdict
    * groups by the full row). The filter side is `words`-bounded →
    * broadcast; `df` never shuffles beyond the verdict's map-side
    * combine.
    */
  def mightContain(df: DataFrame, bloom: DataFrame, keyCol: String,
      words: Int = BloomWords, k: Int = BloomK): DataFrame = {
    val x = norm(keyCol)
    val probes = (0 until k).map(j => bitPos(x, j, words))
    val cols = df.columns.toSeq
    df.withColumn("__pos", explode(array(probes: _*)))
      .select(cols.map(col) :+ expr(s"__pos div $BloomBitsPerWord").as("word_idx")
        :+ expr(s"shiftleft(CAST(1 AS BIGINT), CAST(__pos % $BloomBitsPerWord AS INT))")
          .as("__bit"): _*)
      .join(broadcast(bloom), Seq("word_idx"), "left")
      .groupBy(cols.map(col): _*)
      .agg(sum(when(col("word").isNotNull &&
        col("word").bitwiseAND(col("__bit")) =!= 0L, 1L).otherwise(0L)).as("__hits"))
      .filter(col("__hits") === k.toLong)
      .drop("__hits")
  }
}
