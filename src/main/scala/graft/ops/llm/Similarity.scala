package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`ARRAY<FLOAT>`, TESTDATA embeddings table).
  *
  *  - [[cosineTopK]]: brute-force cosine top-k, blocked by a partition
  *    column — the exactness baseline.
  *  - [[hyperplaneBuckets]] + [[lshCosineTopK]]: random-hyperplane LSH
  *    (Charikar, STOC 2002) — the 100 TB path. Signature bits come from deterministic pseudo-random
  *    hyperplanes (splitmix64-derived coefficients), so no fitted model, no
  *    driver state, identical buckets on every run/cluster. Candidates only
  *    meet within a bucket: comparisons drop from O(N·M) to
  *    O(N·M / 2^bits) for ~uniform data.
  *
  * The O(q×c×dim) multiply-add hot path runs in the custom codegen'd
  * [[graft.functions.FloatDotProduct]] expression — a tight primitive loop
  * over the float arrays (double accumulation), no per-element lambda
  * interpretation, no intermediate array allocation.
  */
object Similarity {
  import graft.functions.VectorFunctions.{float_dot, float_norm}
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Brute-force cosine top-k: `queryPred` selects the query vectors,
    * `blockCol` equality bounds the candidate set. Scores are rounded to 4
    * decimals *before* ranking so ranking is reproducible across
    * accumulation orders.
    */
  def cosineTopK(emb: DataFrame, queryPred: Column, k: Int = 5,
      blockCol: String = "label", idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = emb.withColumn("__nrm", float_norm(col(vecCol)))
    val q = e.filter(queryPred)
      .select(col(blockCol), col(idCol).as("q_id"), col(vecCol).as("q_emb"), col("__nrm").as("q_n"))
    val c = e.select(col(blockCol), col(idCol).as("c_id"), col(vecCol).as("c_emb"), col("__nrm").as("c_n"))
    topKJoin(q, c, k, Seq(blockCol))
  }

  /** GLOBAL (unblocked) brute-force cosine top-k for a SMALL query set —
    * the exact-ground-truth path recall calibration is defined against.
    * Semantically identical to `cosineTopK` with a constant block column,
    * but that shape equi-joins every query×corpus pair through ONE hash
    * partition (the r13 tier-7 finding: ~24× per 10× data on the
    * similarity_ivf_recall truth side, all 20M sf10 pairs in one task).
    * Here the query frame BROADCASTS (it is capped — ~100 rows at every
    * declared call site), so scoring is a map-side nested-loop over the
    * corpus partitions with no shuffle of the embedding arrays at all,
    * and the rank cut runs TWO-LEVEL: a per-(q_id, candidate-hash-block)
    * row_number keeps k rows per block (parallelism = queries × blocks,
    * never 1), then the global per-q_id window ranks only the
    * queries × blocks × k survivors. Exact: every candidate lives in
    * exactly one hash block, scores are rounded before ranking, and the
    * (score desc, c_id) tie order is identical at both levels, so the
    * union of per-block top-k contains the global top-k.
    */
  def cosineTopKGlobal(emb: DataFrame, queryPred: Column, k: Int = 5,
      blocks: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = emb.withColumn("__nrm", float_norm(col(vecCol)))
    val q = broadcast(e.filter(queryPred)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_emb"), col("__nrm").as("q_n")))
    val c = e.select(col(idCol).as("c_id"), col(vecCol).as("c_emb"), col("__nrm").as("c_n"))
    val scored = c.join(q, col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(float_dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4).as("score"),
        pmod(xxhash64(col("c_id")), lit(blocks)).as("__blk"))
    val wLocal = Window.partitionBy("q_id", "__blk")
      .orderBy(col("score").desc, col("c_id"))
    val wGlobal = Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))
    scored
      .withColumn("__rk0", row_number().over(wLocal)).filter(col("__rk0") <= k)
      .withColumn("rk", row_number().over(wGlobal).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "c_id", "score")
  }

  /** Shared scoring tail: join prepared query/candidate frames on the
    * blocking key(s), score, rank, cut at k. The scored rows are projected
    * down to (q_id, c_id, score) BEFORE the rank window so the window
    * exchange shuffles 24-byte rows, never the embedding arrays — and the
    * rank cut is TWO-LEVEL like [[cosineTopKGlobal]]'s (r14): a capped
    * query sample means few distinct q_ids, so a single per-q_id window
    * would bound rank parallelism by the QUERY count no matter how large
    * the corpus (similarity_topk read 14.8×/decade at sf10 with 10M scored
    * pairs riding ≤100 window tasks). The per-(q_id, candidate-hash-block)
    * pre-cut keeps k rows per block at queries × [[RankCutBlocks]]
    * parallelism; the global window then ranks only the tiny survivor set.
    * Exact: every candidate is in exactly one block and the (rounded score
    * desc, c_id) order is identical at both levels.
    */
  private[llm] val RankCutBlocks = 64

  private def topKJoin(q: DataFrame, c: DataFrame, k: Int,
      blockCols: Seq[String]): DataFrame = {
    val wLocal = Window.partitionBy("q_id", "__blk")
      .orderBy(col("score").desc, col("c_id"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))
    q.join(c, blockCols).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(float_dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4).as("score"),
        pmod(xxhash64(col("c_id")), lit(RankCutBlocks)).as("__blk"))
      .withColumn("__rk0", row_number().over(wLocal)).filter(col("__rk0") <= k)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_id", "rk", "c_id", "score")
  }

  /** Random-hyperplane signature: bit i = sign(v · p_i). Hyperplane
    * coefficients come from a splitmix64 mix of (i, j) — fixed, seedless,
    * identical on every run and cluster layout. The planes are tiny
    * (bits × dim floats) so they ship as LITERAL arrays and each
    * projection is one codegen'd [[graft.functions.FloatDotProduct]] —
    * the earlier HOF form evaluated an interpreted lambda per (vector,
    * dimension, bit).
    */
  private def mix(z0: Long): Long = { // splitmix64 finalizer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The fixed hyperplane coefficient matrix — shared with the generated
    * DuckDB oracle SQL (which embeds each coefficient as an exact
    * round-trip double literal, so both engines multiply bit-identical
    * values in the same order and the projection SIGNS agree exactly).
    * `table` selects an independent plane set for multi-table
    * OR-amplification: table 0 is bit-identical to the original single
    * table (plane index = table·bits + i, so existing oracles are
    * unchanged).
    */
  def hyperplanes(bits: Int = 8, dim: Int = 64, table: Int = 0): Array[Array[Float]] =
    Array.tabulate(bits, dim) { (i, j) =>
      ((mix((table.toLong * bits + i) * 1000003L + j) % 1000L) / 1000.0).toFloat
    }

  def hyperplaneBuckets(emb: DataFrame, bits: Int = 8, dim: Int = 64,
      vecCol: String = "embedding", table: Int = 0,
      outCol: String = "lsh_bucket"): DataFrame = {
    val planes = hyperplanes(bits, dim, table)
    val sigBits = (0 until bits).map { i =>
      val proj = graft.functions.VectorFunctions.float_dot(
        col(vecCol), typedlit(planes(i).toSeq))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    emb.withColumn(outCol, sigBits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** Top-k within LSH buckets — the scale path. Recall is tunable along
    * BOTH standard LSH axes: `bits` (fewer bits → bigger buckets → higher
    * recall, more compute) and `tables` (OR-amplification: each vector
    * hashes into one bucket PER independent plane table, candidates meet if
    * they collide in ANY table — miss probability decays exponentially with
    * table count while compute grows only linearly). `tables = 1`
    * reproduces the original single-table behavior bit for bit.
    *
    * Shape at scale: the per-table buckets explode the candidate side
    * `tables`×, but every comparison still happens inside a bucket — never
    * all-pairs — and the same (q, c) pair meeting in several tables is
    * collapsed by rank-dedup (`row_number` keeps one row per (q_id, c_id)
    * before the top-k cut).
    */
  def lshCosineTopK(emb: DataFrame, queryPred: Column, k: Int = 5, bits: Int = 8,
      tables: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    if (tables == 1) {
      cosineTopK(hyperplaneBuckets(emb, bits, vecCol = vecCol), queryPred, k,
        "lsh_bucket", idCol, vecCol)
    } else {
      val e = multiTableKeyed(emb, bits, tables, vecCol)
      val q = e.filter(queryPred)
        .select(col("__tb"), col(idCol).as("q_id"), col(vecCol).as("q_emb"), col("__nrm").as("q_n"))
      val c = e
        .select(col("__tb"), col(idCol).as("c_id"), col(vecCol).as("c_emb"), col("__nrm").as("c_n"))
      // same pair may collide in several tables, always with the identical
      // rounded score → distinct() collapses the duplicates before the
      // k-cut (otherwise a multi-collision pair would eat several ranks).
      // Rank cut is two-level like topKJoin's (r14) — the distinct already
      // exchanges on the full row, so the pre-cut window adds parallelism
      // without an extra full-data shuffle.
      val wLocal = Window.partitionBy("q_id", "__blk")
        .orderBy(col("score").desc, col("c_id"))
      val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))
      q.join(c, Seq("__tb")).filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"),
          round(float_dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4).as("score"))
        .distinct()
        .withColumn("__blk", pmod(xxhash64(col("c_id")), lit(RankCutBlocks)))
        .withColumn("__rk0", row_number().over(wLocal)).filter(col("__rk0") <= k)
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= k)
        .select("q_id", "rk", "c_id", "score")
    }
  }

  /** The shared multi-table LSH scaffold: one row per (vector, table) with
    * the exploded (table, bucket) struct key `__tb` and the precomputed
    * norm `__nrm` — candidates meet iff they share `__tb` for ANY table.
    * Used by the multi-table [[lshCosineTopK]] and
    * [[graft.ops.llm.Dedup.embeddingNearDupsLsh]], so the two paths can
    * never diverge on the bucketing scheme.
    */
  private[llm] def multiTableKeyed(emb: DataFrame, bits: Int, tables: Int,
      vecCol: String): DataFrame = {
    val bucketed = (0 until tables).foldLeft(emb)((df, t) =>
      hyperplaneBuckets(df, bits, vecCol = vecCol, table = t, outCol = s"__bkt$t"))
    bucketed
      .withColumn("__nrm", float_norm(col(vecCol)))
      .withColumn("__tb", explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), col(s"__bkt$t").as("b"))): _*)))
      .drop((0 until tables).map(t => s"__bkt$t"): _*)
  }

  /** Probe order (cells ascending by distance) of a vector against LITERAL
    * centroids — one codegen'd [[graft.functions.NearestCenterOrder]]
    * expression; the centroid matrix is nCells × dim floats, driver-tiny,
    * shipped in the plan as an array-literal REFERENCE (not inlined
    * primitives), so the generated source is center-value-invariant and
    * Lloyd iterations never recompile. Shared by the fit's assignment step
    * and the query-side probe ranking, so the two can never disagree on
    * cell geometry. Empty-center inputs short-circuit to an empty probe
    * array rather than failing analysis.
    */
  private def probeOrder(vecCol: Column, centers: Array[Array[Float]]): Column =
    if (centers.isEmpty) typedlit(Seq.empty[Int])
    else graft.functions.NearestCells.nearest_cells(vecCol, centers)

  /** Nearest-centroid cell id (ties broken by cell index), or NULL when
    * the center set is empty.
    */
  def nearestCell(vecCol: Column, centers: Array[Array[Float]]): Column =
    if (centers.isEmpty) lit(null).cast("int")
    else get(probeOrder(vecCol, centers), lit(0))

  /** Deterministic IVF centroid fit as plain DataFrame Lloyd iterations —
    * no fitted model object, no RDD conversion, and layout-invariant:
    *  - init: the `nCells` vectors with the smallest `xxhash64(id)` — a
    *    pseudo-random but exactly reproducible spread;
    *  - assign: argmin over literal-center distances ([[nearestCell]], all
    *    codegen'd dot products);
    *  - update: per-(cell, dim) means via exact DECIMAL accumulation —
    *    order-independent like every float aggregate in the oracle
    *    contract — so the fitted centers are bit-identical under any
    *    partitioning. A seeded MLlib KMeans is only deterministic for a
    *    FIXED partitioning (kmeans|| samples per partition); this fit is
    *    deterministic, full stop. 3 iterations: IVF needs a coarse
    *    partition of the space, not converged clusters — recall comes from
    *    the per-cell search.
    * The fit runs on a deterministic `xxhash64(id) % mod` sample of
    * ~[[IvfFitSampleTarget]] vectors (persisted across the Lloyd passes),
    * so fit cost is O(sample), independent of corpus size; only the final
    * per-vector assignment in [[ivfCosineTopK]] touches the full corpus,
    * exactly once. Driver state is nCells×dim floats per iteration — the
    * "model is tiny, data is huge" shape that makes IVF work at 100 TB.
    */
  /** Expected size of the deterministic fit sample (see [[fitIvfCenters]]):
    * the sample keeps ids with `xxhash64(id) % mod == 0` where
    * `mod = max(1, n / IvfFitSampleTarget)`, so the realized sample size is
    * ~[target, 2·target). 4096 points for ≤256 cells is ample for a COARSE
    * space partition — IVF recall comes from the per-cell search, not from
    * converged clusters.
    */
  val IvfFitSampleTarget: Long = 4096L

  def fitIvfCenters(emb: DataFrame, nCells: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sampleTarget: Long = IvfFitSampleTarget): Array[Array[Float]] = {
    import org.apache.spark.sql.types.DecimalType
    // Fit on a deterministic hash sample, not the corpus: at 100 TB the
    // Lloyd passes would otherwise re-scan everything `iters`× for a model
    // that only needs a coarse sketch of the density. `xxhash64(id) % mod`
    // is layout-invariant (a property of the ids, not the partitioning)
    // and reproducible on any cluster. Size `mod` from the FITTABLE rows
    // (nulls filtered) — sizing from emb.count() under-samples corpora
    // with many null vectors; and a target below nCells could never seed
    // nCells centers.
    require(sampleTarget >= nCells,
      s"fitIvfCenters: sampleTarget=$sampleTarget cannot seed nCells=$nCells centers")
    val base0 = emb.filter(col(vecCol).isNotNull)
    val n = base0.count()
    val mod = math.max(1L, n / math.max(1L, sampleTarget))
    val sampled = mod > 1
    val base =
      if (sampled)
        base0.filter(pmod(xxhash64(col(idCol)), lit(mod)) === 0)
          // persist: the sample is tiny (~sampleTarget rows) but each Lloyd
          // pass is a separate action — without this, every iteration
          // re-scans the full corpus just to re-apply the hash filter.
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else base0
    try {
      var centers: Array[Array[Float]] = base
        .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nCells)
        .select(vecCol).collect()
        .map(_.getSeq[Float](0).toArray)
      val dim = centers.headOption.map(_.length).getOrElse(return centers)
      // one dsum per dimension in a single groupBy — map-side combinable,
      // the shuffle carries nCells × (dim decimals) rows, never a dim× row
      // explosion (same shape as MinHash's 32 min-aggs in one pass).
      // DECIMAL(18,10) stays within Spark's compact-Long decimal range (≤18
      // digits) — sums run as primitive long arithmetic, not BigDecimal;
      // the sample cap keeps sums far from overflow at any corpus size.
      // The `size == dim` guard skips ragged vectors (they'd contribute
      // NULL tails and bias the mean) and doubles as the ANSI-safe bound
      // on element_at.
      val okSize = size(col(vecCol)) === dim
      val dimSums = (0 until dim).map(j =>
        sum(when(okSize, element_at(col(vecCol), j + 1))
          .cast(DecimalType(18, 10))).as(s"__s$j"))
      val aggs = count(when(not(okSize), lit(1))).as("__bad") +: dimSums
      var badSeen = 0L
      for (_ <- 1 to iters) {
        val rows = base
          .withColumn("__cell", nearestCell(col(vecCol), centers))
          .groupBy("__cell")
          .agg(count(when(okSize, lit(1))).as("__n"), aggs: _*)
          .collect()
        val next = centers.map(_.clone()) // empty cells keep their center
        badSeen = 0L // same excluded set every pass; keep the last total
        rows.foreach { r =>
          val cell = r.getInt(0)
          val nOk = r.getLong(1)
          badSeen += r.getLong(2)
          if (nOk > 0) {
            var j = 0
            while (j < dim) {
              val s = r.getDecimal(3 + j)
              if (s != null) next(cell)(j) = (s.doubleValue() / nOk).toFloat
              j += 1
            }
          }
        }
        centers = next
      }
      if (badSeen > 0) log.warn(
        s"fitIvfCenters: $badSeen sampled vector(s) had length != $dim and were excluded from the fit")
      centers
    } finally {
      if (sampled) base.unpersist(false)
    }
  }

  /** IVF (inverted-file) coarse quantization: fit centroids
    * ([[fitIvfCenters]] — deterministic DataFrame Lloyd), assign each
    * vector to its nearest centroid, then search the `nprobe` nearest
    * cells per query. The classic ANN index shape: the "model" is a tiny
    * centroid matrix, the assignment and the per-cell search are fully
    * distributed. `nCells` trades recall for compute exactly like IVF
    * nlist; `nprobe > 1` fixes the recall cliff at cell boundaries (a
    * query near a Voronoi face also searches the adjacent cells) at
    * `nprobe`× the per-query compute.
    */
  /** Fitted centers memoized per (session, cacheKey, nCells, sampleTarget)
    * — the index-build-once / query-many shape every IVF deployment has:
    * the fit is deterministic (hash sample + Lloyd from sorted seeds), so
    * the memo returns the identical model a re-fit would. Same lifetime
    * rules as Tables/GraphAnalytics (see [[graft.model.SessionCache]]);
    * `Similarity.warm` pre-builds it so bench timings attribute the fit
    * to the session, not to whichever query runs first.
    */
  private val centerCache =
    new graft.model.SessionCache[(String, Int, Long), Array[Array[Float]]]

  def fitIvfCentersCached(emb: DataFrame, cacheKey: String, nCells: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      sampleTarget: Long = IvfFitSampleTarget): Array[Array[Float]] =
    centerCache.getOrElseUpdate(emb.sparkSession, (cacheKey, nCells, sampleTarget)) {
      fitIvfCenters(emb, nCells, idCol = idCol, vecCol = vecCol,
        sampleTarget = sampleTarget)
    }

  /** Pre-fit the IVF index the declared query uses — the bench warmup
    * hook, owned here so the warmed parameters cannot drift from
    * [[ivfCosineTopK]]'s defaults.
    */
  def warm(spark: org.apache.spark.sql.SparkSession, sfDir: String): Unit = {
    fitIvfCentersCached(graft.model.Tables(spark, sfDir, "embeddings"), sfDir, 16)
    ()
  }

  def ivfCosineTopK(emb: DataFrame, queryPred: Column, k: Int = 5, nCells: Int = 16,
      nprobe: Int = 3, idCol: String = "vec_id", vecCol: String = "embedding",
      sampleTarget: Long = IvfFitSampleTarget,
      cacheKey: Option[String] = None): DataFrame = {
    val centers = cacheKey match {
      case Some(key) => fitIvfCentersCached(emb, key, nCells,
        idCol = idCol, vecCol = vecCol, sampleTarget = sampleTarget)
      case None => fitIvfCenters(emb, nCells, idCol = idCol, vecCol = vecCol,
        sampleTarget = sampleTarget)
    }
    if (centers.isEmpty) { // empty corpus: no cells to probe — return an
      // empty result with the contract schema instead of failing analysis.
      return emb.select(col(idCol).as("q_id"), lit(0L).as("rk"),
        col(idCol).as("c_id"), lit(0.0).as("score")).where(lit(false))
    }
    val e = emb
      .withColumn("__ord", probeOrder(col(vecCol), centers))
      .withColumn("__nrm", float_norm(col(vecCol)))
    val c = e.select(get(col("__ord"), lit(0)).as("ivf_cell"),
      col(idCol).as("c_id"), col(vecCol).as("c_emb"), col("__nrm").as("c_n"))
    // query-side multi-probe: the nprobe nearest cells explode into one
    // probe row each.
    val q = e.filter(queryPred)
      .withColumn("ivf_cell", explode(slice(col("__ord"), 1, nprobe)))
      .select(col("ivf_cell"), col(idCol).as("q_id"),
        col(vecCol).as("q_emb"), col("__nrm").as("q_n"))
    // a candidate lives in exactly ONE cell, so probe fan-out never
    // duplicates a (q, c) pair — the shared top-k tail applies unchanged.
    topKJoin(q, c, k, Seq("ivf_cell"))
  }

  /** Per-vector symmetric int8 quantization audit (Jacob et al., CVPR
    * 2018 §2.1 shape): scale = max|x|/127, q_i = ⌊x_i/scale + 0.5⌋, and
    * the reconstruction-error report a pipeline gates on before swapping
    * its ANN index to the 4×-smaller int8 codes. Round-half-up is spelled
    * as floor(x+0.5) on BOTH engines (never the banker's-rounding
    * built-in), and per-element errors are fixed-pointed to integer
    * micro-units BEFORE summing so the per-vector totals are
    * order-independent. All-zero vectors quantize to zero exactly.
    *
    * Scale: pure map work over the embedding column — no shuffle, no
    * fitted state, codegen'd HOFs end to end; at 100 TB this is a single
    * scan that could write the int8 codes alongside.
    */
  def quantizeInt8Audit(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(col(idCol), col("label"),
        expr(s"transform($vecCol, x -> cast(x as double))").as("v"))
      .withColumn("mx", expr(
        "aggregate(v, cast(0.0 as double), (a, x) -> greatest(a, abs(x)))"))
      .withColumn("scale", col("mx") / lit(127.0))
      .withColumn("q", expr(
        "transform(v, x -> if(mx = 0.0d, 0L, cast(floor(x / scale + 0.5d) as bigint)))"))
      .withColumn("eu", expr(
        "zip_with(v, q, (x, qq) -> cast(floor(abs(x - qq * scale) * 1e6 + 0.5d) as bigint))"))
      .select(col(idCol), col("label"),
        size(col("v")).cast("long").as("n_dims"),
        round(col("scale"), 6).as("scale6"),
        expr("aggregate(eu, 0L, (a, x) -> a + x)").as("sum_err_units"),
        array_max(col("eu")).as("max_err_units"),
        expr("aggregate(q, 0L, (a, x) -> a + if(abs(x) = 127L, 1L, 0L))")
          .as("n_saturated"))
}
