package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches under EXACT verification.
  *
  * `agg_sketch` (approx_count_distinct / percentile_approx) is rows-only
  * in the oracle contract because Spark's HLL++ and DuckDB's approx
  * functions implement different sketches. This module closes that gap
  * from the other side: a HyperLogLog built from REPLAYABLE integer
  * arithmetic only — an affine-then-QUADRATIC hash mod the Mersenne
  * prime 2³¹−1 (the quadratic step breaks the bucket/rank correlation
  * that biased a two-affine-hash draft ~50% high on sequential keys; all
  * intermediates ≤ (2³¹)² stay inside BIGINT), bucket = the hash's top
  * 8 bits, rank = trailing zeros of its low 23 bits via
  * `bit_count((h & -h) − 1)`, and registers
  * folded as exact scaled powers of two (`1 << (31 − r)` summed as
  * BIGINT, ≤ 2³⁹ for 256 buckets — far inside exact-integer range). The
  * final estimate is one IEEE multiply/divide of identical exact inputs
  * on both engines, so the APPROXIMATE count hash-matches the SQL oracle
  * bit for bit (Flajolet et al., "HyperLogLog: the analysis of a
  * near-optimal cardinality estimation algorithm", AofA 2007).
  *
  * 100 TB shape: one map-side-combinable `max` per (group, bucket) — the
  * shuffle carries ≤ m rows per group regardless of input size, the
  * defining property of a mergeable sketch; register tables for any
  * group count are tiny. No linear-counting branch: it needs `ln`
  * (libm ULPs differ across engines) and only matters when the estimate
  * is below 2.5·m — callers counting that low should count exactly.
  */
object Sketches {

  /** Buckets (m): 256 → standard error 1.04/√m ≈ 6.5 %. */
  final val HllBuckets = 256
  /** Bits feeding the rank (the hash's low bits; the top 8 pick the
    * bucket) — rank ∈ [1, 24], an all-zero slice capping automatically.
    */
  final val HllRankBits = 23
  // classic LCG multiplier/increment, < 2³¹ so a·x' stays in BIGINT.
  // Public like Dedup.P / Shuffle.P: generated oracles normalize keys
  // with the SAME modulus the sketch builders use (one source of truth).
  final val P = 2147483647L // 2³¹ − 1 (Mersenne)
  private final val A1 = 1103515245L
  private final val B1 = 12345L

  /** α_m · m² · 2³¹ as an exact double product of literals — the same
    * expression the generated SQL evaluates, so both engines perform the
    * identical IEEE operations.
    */
  private def alphaNumerator: Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(2147483648.0)

  /** Per-`groupCol` HLL registers and estimate over non-negative integer
    * keys in `keyCol`. Output: group, `v_zero` (empty registers),
    * `z_scaled` (exact Σ 2^(31−r) over all m registers, BIGINT), and
    * `est_hll` (raw HLL estimate, 4 dp).
    */
  def hllReplayable(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    hllEstimate(hllRegisters(df, groupCol, keyCol))

  /** The per-group register table `(grp, b, r)` [[hllReplayable]] reduces —
    * split out because registers merge as a JOIN-SEMILATTICE (per-bucket
    * max), which is what lets window/union consumers (sketch_hll_sliding)
    * combine group sketches without touching raw keys.
    */
  def hllRegisters(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val x = (col(keyCol).cast("long") % P + P) % P
    val h1 = (lit(A1) * x + lit(B1)) % P
    val q = (h1 * h1 + h1) % P
    val mask = (1L << HllRankBits) - 1
    df.select(col(groupCol).as("grp"), q.as("q"))
      .select(col("grp"),
        expr(s"shiftright(q, $HllRankBits)").as("b"),
        expr(s"least(${HllRankBits + 1}, bit_count(((q & $mask) & -(q & $mask)) - 1) + 1)").as("rk"))
      .groupBy("grp", "b").agg(max("rk").as("r"))
  }

  /** The HLL estimate over a prepared register table `(grp, b, r)`. */
  def hllEstimate(reg: DataFrame): DataFrame =
    reg.groupBy("grp")
      .agg(
        (sum(expr("shiftleft(CAST(1 AS BIGINT), 31 - r)"))
          + (lit(HllBuckets.toLong) - count(lit(1))) * lit(1L << 31))
          .as("z_scaled"),
        (lit(HllBuckets.toLong) - count(lit(1))).as("v_zero"))
      .select(col("grp"), col("v_zero"), col("z_scaled"),
        round(alphaNumerator / col("z_scaled").cast("double"), 4).as("est_hll"))

  // ---------------------------------------------------------------------
  // Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  // summary: the count-min sketch and its applications", J. Algorithms
  // 2005) from REPLAYABLE integer arithmetic — the heavy-hitters /
  // frequency-estimation companion to [[hllReplayable]]: d×w bounded
  // counters whatever the input size, merge = elementwise BIGINT sum (an
  // abelian group → map-side combinable, partition-layout invariant), and
  // estimates are exact-integer minima, so the APPROXIMATE counts
  // hash-match a SQL oracle built from the same constants.
  //
  // 100 TB shape: the sketch build shuffles ≤ d·w rows total regardless
  // of token count — the fixed-memory alternative to a vocabulary-wide
  // exact groupBy for frequency screening (stopword thresholds, candidate
  // heavy-hitter cuts). Estimates never undercount (one-sided error:
  // est ≥ exact always; ε = e/w overcount bound with probability
  // 1 − e^−d), which is what makes a CMS cut safe for keep/drop
  // decisions — a true heavy hitter cannot slip under the threshold.
  // ---------------------------------------------------------------------

  /** Sketch depth (independent hash rows): error prob e^−4 ≈ 1.8 %. */
  final val CmsDepth = 4
  /** Sketch width (buckets per row): overcount ε = e/1024 ≈ 0.27 % of
    * the total stream count, with d×w = 4096 total counters.
    */
  final val CmsWidth = 1024

  /** Per-row affine constants (a_j, b_j) for the universal hash family
    * h_j(x) = ((a_j·x + b_j) mod P) mod w — fixed odd literals < P so
    * a·x stays inside BIGINT and the same numbers drive the generated
    * oracle SQL.
    */
  private[graft] val cmsRows: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L),
    (1223106847L, 271828183L),
    (1431655765L, 141421357L),
    (1140671485L, 720720733L))

  private def cmsBucket(x: Column, j: Int): Column = {
    val (a, b) = cmsRows(j)
    ((lit(a) * x + lit(b)) % P) % CmsWidth
  }

  /** Build the sketch over one row per ITEM OCCURRENCE: `keyCol` is a
    * non-negative BIGINT item hash (e.g. a poly_fold of the token).
    * Output `(j, bucket, cnt)` — at most [[CmsDepth]]×[[CmsWidth]] rows,
    * one map-side-combinable groupBy however large the input. Building
    * from pre-aggregated `(item, count)` pairs via weights summed per
    * bucket yields the identical sketch (the oracle does exactly that).
    */
  def cmsSketch(items: DataFrame, keyCol: String): DataFrame = {
    val x = (col(keyCol).cast("long") % P + P) % P
    val probes = (0 until CmsDepth).map(j =>
      struct(lit(j.toLong).as("j"), cmsBucket(x, j).as("bucket")))
    items.select(explode(array(probes: _*)).as("r"))
      .groupBy(col("r.j").as("j"), col("r.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch for every candidate row: `est_cnt` = the
    * minimum over the d probed counters (0 for never-seen keys).
    * Candidate rows must be DISTINCT (the estimate groups by the full
    * candidate row). The sketch side is d·w-bounded by construction →
    * broadcast: candidates never shuffle.
    */
  def cmsEstimate(candidates: DataFrame, sketch: DataFrame, keyCol: String): DataFrame = {
    val x = (col(keyCol).cast("long") % P + P) % P
    val probes = (0 until CmsDepth).map(j =>
      struct(lit(j.toLong).as("j"), cmsBucket(x, j).as("bucket")))
    val candCols = candidates.columns.toSeq
    candidates
      .withColumn("__p", explode(array(probes: _*)))
      .select(candCols.map(col) :+ col("__p.j").as("j") :+ col("__p.bucket").as("bucket"): _*)
      .join(broadcast(sketch), Seq("j", "bucket"), "left")
      .groupBy(candCols.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** CONTINUOUS sketch maintenance: a handle whose [[MaintainedCms.sink]]
    * folds each micro-batch of item occurrences into the running sketch
    * via `foreachBatch` — the streaming twin of [[cmsSketch]], and the
    * shape a pipeline actually runs over an unbounded token stream.
    * Because merge is an elementwise BIGINT sum (abelian), the maintained
    * sketch equals the batch-built sketch over ANY prefix of batches
    * (SketchesSpec drives it over memory-stream micro-batches and checks
    * exactly that). State held is the sketch itself — ≤ d·w rows, lineage
    * cut per batch — so the query runs forever in constant space, no
    * watermark needed (pure monotone accumulation).
    */
  def maintainedCms(keyCol: String): MaintainedCms = new MaintainedCms(keyCol)

  /** DuckDB replay of the [[cmsSketch]] bucket expression over `hExpr`
    * for row `j` — same constants as [[cmsBucket]].
    */
  def cmsBucketSql(hExpr: String, j: Int): String = {
    val (a, b) = cmsRows(j)
    s"(($a * $hExpr + $b) % $P) % $CmsWidth"
  }

  // ---------------------------------------------------------------------
  // Equi-width histogram quantiles — the third replayable sketch next to
  // HLL (distinct) and CMS (frequency): approximate per-group quantiles
  // from a bins-bounded count histogram. Two combinable passes (min/max/n,
  // then bin counts against the broadcast stats), a ≤bins-row per-group
  // cumulative window, and an interpolated estimate that is pure IEEE
  // arithmetic over exact integers and the two range endpoints — the same
  // expression shape on both engines, so the APPROXIMATE quantile
  // hash-matches its oracle. Error bound: the true rank-target value lies
  // in the chosen bin, so |est − exact| ≤ one bin width = (hi−lo)/bins
  // (asserted against the exact interpolated quantile in SketchesSpec).
  //
  // 100 TB shape: where the exact quantile (quantile_cont) must rank every
  // row (a full per-group sort), this shuffles ≤ groups·bins count rows
  // after map-side combine. The bin range is data-dependent (pass 1), so
  // merging sketches requires a shared range — fix the range a priori for
  // streaming accumulation, as production histogram sketches do.
  // ---------------------------------------------------------------------

  /** Histogram buckets per group. */
  final val HistBins = 256

  /** Per-`groupCol` approximate quantiles of `valCol` at the rational
    * probe points `ps` (numerator, denominator). Output: group, `p`
    * (double), `est_q` (roundScale dp).
    */
  def histQuantile(df0: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(Int, Int)] = Seq((1, 4), (1, 2), (9, 10)),
      bins: Int = HistBins, roundScale: Int = 6): DataFrame = {
    // NULL values are excluded EXPLICITLY on both sides (quantiles of
    // nothing): min/max already ignore nulls, but a bare count(*) would
    // set rank targets the null-free histogram can never reach, and a
    // NULL bin row would hit the engines' opposite window null-ordering
    // (Spark NULLS FIRST vs DuckDB NULLS LAST) — divergence, not just
    // wrong answers.
    val df = df0.filter(col(valCol).isNotNull)
    val v = col(valCol).cast("double")
    val stats = df.groupBy(groupCol).agg(
      min(v).as("__lo"), max(v).as("__hi"), count(lit(1)).as("__n"))
    // degenerate single-value groups land in bin 0; the top edge value is
    // clamped into the last bin (floor of exactly bins otherwise)
    val binExpr = when(col("__hi") === col("__lo"), lit(0L))
      .otherwise(least(lit((bins - 1).toLong),
        floor((v - col("__lo")) / (col("__hi") - col("__lo")) * lit(bins.toDouble))
          .cast("long")))
    val counts = df.join(broadcast(stats), groupCol)
      .withColumn("__bin", binExpr)
      .groupBy(col(groupCol), col("__bin")).agg(count(lit(1)).as("__c"))
    val wC = Window.partitionBy(groupCol).orderBy("__bin")
    val cum = counts
      .withColumn("__cum", sum(col("__c")).over(wC))
      .withColumn("__before", col("__cum") - col("__c"))
    // rank targets as EXACT integers: target = ceil(n·nu/de) via div
    val probes = stats.select(col(groupCol), col("__lo"), col("__hi"), col("__n"),
        explode(array(ps.map { case (nu, de) =>
          struct(lit(nu.toLong).as("nu"), lit(de.toLong).as("de")) }: _*)).as("__p"))
      .select(col(groupCol), col("__lo"), col("__hi"), col("__n"),
        col("__p.nu").as("__nu"), col("__p.de").as("__de"))
      .withColumn("__target", expr("(__n * __nu + __de - 1) div __de"))
    val crossing = probes
      .join(cum.select(col(groupCol), col("__bin"), col("__cum")), Seq(groupCol))
      .filter(col("__cum") >= col("__target"))
      .groupBy(col(groupCol), col("__nu"), col("__de"), col("__target"),
        col("__lo"), col("__hi"))
      .agg(min(col("__bin")).as("__bstar"))
    crossing
      .join(cum.select(col(groupCol), col("__bin").as("__bstar"),
        col("__c"), col("__before")), Seq(groupCol, "__bstar"))
      .select(col(groupCol),
        (col("__nu").cast("double") / col("__de")).as("p"),
        round(col("__lo") + (col("__hi") - col("__lo")) / lit(bins.toDouble) *
          (col("__bstar").cast("double") +
            (col("__target") - col("__before")).cast("double") /
              col("__c").cast("double")), roundScale).as("est_q"))
  }

  /** DuckDB replay of [[histQuantile]] — same bins, same probe rationals,
    * same IEEE expression shapes, generated so the two sides cannot
    * drift.
    */
  def histQuantileOracleSql(table: String, grpCol: String, valCol: String,
      ps: Seq[(Int, Int)] = Seq((1, 4), (1, 2), (9, 10)),
      bins: Int = HistBins, roundScale: Int = 6): String = {
    val values = ps.map { case (nu, de) => s"($nu, $de)" }.mkString(", ")
    s"""WITH st AS (SELECT $grpCol AS grp, MIN(CAST($valCol AS DOUBLE)) AS lo,
       |    MAX(CAST($valCol AS DOUBLE)) AS hi, COUNT(*) AS n
       |  FROM $table WHERE $valCol IS NOT NULL GROUP BY 1),
       |bnd AS (SELECT st.grp,
       |    CASE WHEN st.hi = st.lo THEN CAST(0 AS BIGINT)
       |         ELSE LEAST(${bins - 1}, CAST(floor((CAST(t.$valCol AS DOUBLE) - st.lo)
       |                / (st.hi - st.lo) * $bins.0) AS BIGINT)) END AS bin
       |  FROM $table t JOIN st ON t.$grpCol = st.grp
       |  WHERE t.$valCol IS NOT NULL),
       |c AS (SELECT grp, bin, COUNT(*) AS c FROM bnd GROUP BY grp, bin),
       |cum AS (SELECT grp, bin, c,
       |    SUM(c) OVER (PARTITION BY grp ORDER BY bin) AS cum FROM c),
       |pr AS (SELECT st.grp, st.lo, st.hi,
       |    CAST(p.nu AS BIGINT) AS nu, CAST(p.de AS BIGINT) AS de,
       |    (st.n * p.nu + p.de - 1) // p.de AS target
       |  FROM st, (VALUES $values) p(nu, de)),
       |cr AS (SELECT pr.grp, pr.nu, pr.de, pr.lo, pr.hi, pr.target,
       |    MIN(cum.bin) AS bstar
       |  FROM pr JOIN cum ON cum.grp = pr.grp AND cum.cum >= pr.target
       |  GROUP BY pr.grp, pr.nu, pr.de, pr.lo, pr.hi, pr.target)
       |SELECT cr.grp AS $grpCol, CAST(cr.nu AS DOUBLE) / cr.de AS p,
       |  round(cr.lo + (cr.hi - cr.lo) / $bins.0 *
       |    (CAST(cr.bstar AS DOUBLE) +
       |      CAST(cr.target - (cum.cum - cum.c) AS DOUBLE) / CAST(cum.c AS DOUBLE)),
       |    $roundScale) AS est_q
       |FROM cr JOIN cum ON cum.grp = cr.grp AND cum.bin = cr.bstar
       |ORDER BY $grpCol, p""".stripMargin
  }

  /** DuckDB replay of the sketch_hll_sliding pipeline: per-hour HLL
    * registers over `keyExpr`, register-max merge into the trailing
    * `winHours`-hour window ending at each EXISTING hour, the estimate
    * formula, and the exact distinct count as the calibration column —
    * all generated from the same constants as [[hllRegisters]].
    */
  def hllSlidingOracleSql(winHours: Int): String = {
    val mask = (1L << HllRankBits) - 1
    val ends = (0 until winHours).map(i => s"ih + $i").mkString("[", ", ", "]")
    val endsG = (0 until winHours).map(i => s"grp + $i").mkString("[", ", ", "]")
    s"""WITH ev AS (SELECT epoch_us(ts) // 3600000000 AS ih, user_id FROM events),
       |hrs AS (SELECT DISTINCT ih FROM ev),
       |k AS (SELECT ih AS grp, ((CAST(user_id AS BIGINT) % $P) + $P) % $P AS x FROM ev),
       |h0 AS (SELECT grp, ($A1 * x + $B1) % $P AS h1 FROM k),
       |h AS (SELECT grp, (h1 * h1 + h1) % $P AS q FROM h0),
       |rr AS (SELECT grp, q >> $HllRankBits AS b,
       |        LEAST(${HllRankBits + 1}, bit_count(((q & $mask) & -(q & $mask)) - 1) + 1) AS rk FROM h),
       |reg AS (SELECT grp, b, MAX(rk) AS r FROM rr GROUP BY grp, b),
       |wr AS (SELECT w, b, MAX(r) AS r FROM (
       |        SELECT unnest($endsG) AS w, b, r FROM reg)
       |       WHERE w IN (SELECT ih FROM hrs) GROUP BY w, b),
       |z AS (SELECT w,
       |        CAST(SUM(CAST(1 AS BIGINT) << (31 - r))
       |          + ($HllBuckets - COUNT(*)) * ${1L << 31} AS BIGINT) AS z_scaled,
       |        CAST($HllBuckets - COUNT(*) AS BIGINT) AS v_zero
       |      FROM wr GROUP BY w),
       |ex AS (SELECT w, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact FROM (
       |        SELECT unnest($ends) AS w, user_id
       |        FROM (SELECT DISTINCT ih, user_id FROM ev))
       |       WHERE w IN (SELECT ih FROM hrs) GROUP BY w)
       |SELECT z.w AS w_end, n_exact, v_zero, z_scaled,
       |  round(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))
       |    * CAST(65536 AS DOUBLE) * CAST(2147483648 AS DOUBLE)
       |    / CAST(z_scaled AS DOUBLE), 4) AS est_hll
       |FROM z JOIN ex ON ex.w = z.w ORDER BY w_end""".stripMargin
  }

  /** DuckDB replay of [[hllReplayable]] over `keyExpr` grouped by
    * `grpExpr` from `table` — generated from the same constants, so the
    * implementation and its oracle cannot drift.
    */
  def hllOracleSql(table: String, grpExpr: String, keyExpr: String): String =
    s"""WITH k AS (SELECT $grpExpr AS grp,
       |             ((CAST($keyExpr AS BIGINT) % $P) + $P) % $P AS x FROM $table),
       |h0 AS (SELECT grp, ($A1 * x + $B1) % $P AS h1 FROM k),
       |h AS (SELECT grp, (h1 * h1 + h1) % $P AS q FROM h0),
       |r AS (SELECT grp, q >> $HllRankBits AS b,
       |        LEAST(${HllRankBits + 1}, bit_count(((q & ${(1L << HllRankBits) - 1}) & -(q & ${(1L << HllRankBits) - 1})) - 1) + 1) AS rk FROM h),
       |reg AS (SELECT grp, b, MAX(rk) AS r FROM r GROUP BY grp, b),
       |z AS (SELECT grp,
       |        CAST(SUM(CAST(1 AS BIGINT) << (31 - r))
       |          + ($HllBuckets - COUNT(*)) * ${1L << 31} AS BIGINT) AS z_scaled,
       |        CAST($HllBuckets - COUNT(*) AS BIGINT) AS v_zero
       |      FROM reg GROUP BY grp)
       |SELECT grp, v_zero, z_scaled,
       |  round(CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE))
       |    * CAST(65536 AS DOUBLE) * CAST(2147483648 AS DOUBLE)
       |    / CAST(z_scaled AS DOUBLE), 4) AS est_hll
       |FROM z ORDER BY grp""".stripMargin
}

/** Incrementally-maintained sliding-window HLL — the streaming twin of
  * `sketch_hll_sliding` (TENTH streaming twin), with the strongest
  * contract class (RateView/DriftView): per-(hour, bucket) registers
  * merge by MAX — a join-semilattice, idempotent AND commutative — so
  * the fold is order-independent, duplicate-tolerant (a replayed event
  * cannot move a register), and parity with the batch query holds under
  * ANY split of the input into batches, no watermark needed. State is
  * ≤ hours×256 register rows, lineage cut per batch.
  */
final class SlidingHllView(spark: org.apache.spark.sql.SparkSession,
    winHours: Int = 3) {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.functions._
  private var reg: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[Row], StructType(Seq(
      StructField("grp", LongType), StructField("b", LongType),
      StructField("r", IntegerType))))

  /** foreachBatch sink: `stream.writeStream.foreachBatch(view.sink)`. */
  def sink(batch: DataFrame, batchId: Long): Unit = { processBatch(batch); () }

  // event-time high-water mark across folded batches (max unix_micros(ts)
  // seen): the watermark base for [[finalizedWindows]]. One 1-row driver
  // read per micro-batch, off the same batch scan the fold pays anyway.
  private var maxEventMicros: Option[Long] = None

  /** Fold one micro-batch of raw events into the register state. */
  def processBatch(batch: DataFrame): Unit = {
    val b = Sketches.hllRegisters(
      batch.select(expr("unix_micros(ts) div 3600000000").as("ih"),
        col("user_id")), "ih", "user_id")
    reg = reg.unionByName(b.select(col("grp"), col("b"),
        col("r").cast(IntegerType).as("r")))
      .groupBy("grp", "b").agg(max(col("r")).as("r"))
      .localCheckpoint()
    val bm = batch.agg(max(expr("unix_micros(ts)"))).head()
    if (!bm.isNullAt(0))
      maxEventMicros = Some(maxEventMicros.fold(bm.getLong(0))(
        math.max(_, bm.getLong(0))))
  }

  /** Per-window estimates over everything folded so far — identical to
    * the batch sketch pipeline on the union of all batches, by the
    * semilattice merge. (Estimate only — the batch query's exact
    * calibration column needs the raw keys a sketch view cannot keep.)
    */
  def windows: DataFrame = {
    val hrs = reg.select(col("grp").as("w")).distinct()
    val wreg = reg
      .select(explode(array((0 until winHours).map(i =>
        col("grp") + lit(i.toLong)): _*)).as("w"), col("b"), col("r"))
      .join(broadcast(hrs), "w")
      .groupBy(col("w").as("grp"), col("b")).agg(max(col("r")).as("r"))
    Sketches.hllEstimate(wreg)
      .select(col("grp").as("w_end"), col("v_zero"), col("z_scaled"),
        col("est_hll"))
  }

  /** The event-time watermark after the folded batches: max event time
    * seen minus `delayMicros` — the standard bounded-lateness contract
    * (no admissible late event is older than the watermark). None before
    * the first non-empty batch.
    */
  def watermarkMicros(delayMicros: Long): Option[Long] =
    maxEventMicros.map(_ - delayMicros)

  /** Watermark-driven FINAL windows: a sliding window ending at hour `w`
    * covers hours (w−winHours, w], so it is final exactly when hour `w`
    * is closed under the watermark — `(w+1)·3600s ≤ watermark`, i.e.
    * `w < watermarkHour` — because no admissible event can still land in
    * any hour it covers. Emission is monotone exactly-once: a window
    * enters this frame when the watermark passes its end hour and never
    * leaves or changes afterwards (the registers feeding a closed hour
    * are frozen by the same contract).
    */
  def finalizedWindows(delayMicros: Long): DataFrame =
    watermarkMicros(delayMicros) match {
      case None => windows.limit(0)
      case Some(wm) =>
        windows.filter(col("w_end") < lit(Math.floorDiv(wm, 3600000000L)))
    }

  /** Current state size (register rows ≤ hours×256). */
  def stateSize: Long = reg.count()
}

/** Handle to a continuously-maintained Count-Min sketch — see
  * [[Sketches.maintainedCms]]. Mirrors [[MaintainedView]]: `current` is
  * safe to read between batches; batches fold under a lock (micro-batches
  * of one query never overlap, the lock just makes the handle shareable).
  */
final class MaintainedCms private[ops] (keyCol: String) {
  @volatile private var cur: Option[DataFrame] = None

  /** The running sketch `(j, bucket, cnt)`; empty before the first batch. */
  def current: Option[DataFrame] = cur

  /** `foreachBatch` function: `stream.writeStream.foreachBatch(cms.sink)`. */
  def sink: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, _) => synchronized {
      val b = Sketches.cmsSketch(batch.toDF(), keyCol)
      val merged = cur match {
        case Some(s) => s.unionAll(b)
          .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
        case None => b
      }
      cur = Some(merged.localCheckpoint())
    }
}
