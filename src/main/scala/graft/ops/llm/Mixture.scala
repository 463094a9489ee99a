package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic data-mixing schedule — the step that decides the ORDER
  * training examples from differently-weighted sources are fed to the
  * trainer (the "mixture" every multi-source pretraining pipeline runs;
  * cf. The Pile / Dolma source-weight tables). No randomness: this is
  * stride scheduling (Waldspurger & Weihl, OSDI '94) on integer virtual
  * time, so the schedule is a pure function of (ids, weights) and
  * replayable in SQL.
  *
  * Semantics: source `s` with weight `w_s` emits its k-th document
  * (1-based, `idCol` order) at virtual time `vt = k · (W / w_s)` where
  * `W = lcm(weights)` — higher weight → proportionally denser in the
  * stream. The global order is `(vt, source, k)`; interleaving is exact:
  * any weight-w source owns a w/Σw share of every schedule prefix
  * (±1 per source, the classic stride bound).
  *
  * 100 TB shape: per-source sequence numbers come from a window
  * partitioned BY SOURCE (parallel across sources; for a single gigantic
  * source swap in the two-level prefix sum of [[Packing.packSequences]]).
  * The global position is CLOSED-FORM — pos(s,k) = 1 + (k-1) +
  * Σ_{s'≠s} |{k' ≤ n_{s'} : (vt',s',k') < (vt,s,k)}| — computed against a
  * broadcast per-source stats table (|sources| rows), so NO global
  * window or single-partition sort ever touches per-document rows; a
  * consumer materializes the stream with `repartitionByRange(vt, source)`.
  */
object Mixture {

  private def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
  private def lcm(a: Long, b: Long): Long = a / gcd(a, b) * b

  /** Interleave `docs` across `sourceCol` groups with integer `weights`
    * (sources absent from the map get `defaultWeight`). Output: one row
    * per doc with `vt` (virtual time), per-source `k`, and the exact
    * 1-based `global_pos` of the (vt, source, k) order.
    */
  def interleaveSources(docs: DataFrame, weights: Map[String, Int],
      defaultWeight: Int = 1, sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(defaultWeight > 0, "defaultWeight must be positive")
    require(weights.values.forall(_ > 0), "weights must be positive")
    val big = (weights.values.map(_.toLong).toSet + defaultWeight.toLong)
      .reduce(lcm)
    // step per source: W / w — smaller step = denser in the stream
    val stepOf: Column = weights.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (s, w)) => acc.when(col(sourceCol) === s, lit(big / w))
    }.otherwise(lit(big / defaultWeight))
    val wK = Window.partitionBy(sourceCol).orderBy(idCol)
    val seq = docs.select(col(idCol), col(sourceCol))
      .withColumn("k", row_number().over(wK).cast("long"))
      .withColumn("__step", stepOf)
      .withColumn("vt", col("k") * col("__step"))
    // broadcast per-source stats for the closed-form rank
    val stats = seq.groupBy(sourceCol)
      .agg(max("k").as("__n"), max("__step").as("__ostep"))
      .select(col(sourceCol).as("__osrc"), col("__n"), col("__ostep"))
    // earlier rows contributed by source s' to the position of (vt, s, k):
    //   strictly-earlier vt:  min(n', (vt - 1) div step')
    //   vt ties break by source asc: +1 when s' < s emits exactly at vt
    // For s' = s the first term is exactly k - 1 and the tie term is 0,
    // so summing over ALL sources (plain cross of the broadcast stats)
    // gives pos - 1 with no special case.
    val earlier =
      least(col("__n"), expr("(vt - 1) div __ostep")) +
        when(col("__osrc") < col(sourceCol) &&
          col("vt") % col("__ostep") === 0 &&
          expr("vt div __ostep") <= col("__n"), 1L)
          .otherwise(0L)
    seq.crossJoin(broadcast(stats))
      .groupBy(sourceCol, idCol, "k", "vt")
      .agg((sum(earlier) + 1L).as("global_pos"))
      .select(col("global_pos"), col("vt"), col(sourceCol), col(idCol), col("k"))
  }
}
