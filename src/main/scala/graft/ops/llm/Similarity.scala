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

  /** Shared scoring tail: join prepared query/candidate frames on the
    * blocking key(s), score, rank, cut at k. The scored rows are projected
    * down to (q_id, c_id, score) BEFORE the rank window so the window
    * exchange shuffles 24-byte rows, never the embedding arrays.
    */
  private def topKJoin(q: DataFrame, c: DataFrame, k: Int,
      blockCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))
    q.join(c, blockCols).filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        round(float_dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4).as("score"))
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
      val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))
      q.join(c, Seq("__tb")).filter(col("q_id") =!= col("c_id"))
        .select(col("q_id"), col("c_id"),
          round(float_dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4).as("score"))
        .distinct()
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

  /** (distance, cell) structs of a vector column against LITERAL centroid
    * arrays: d = c·c − 2·v·c (v·v is constant per row, so dropping it
    * leaves the ordering unchanged). Each distance is one codegen'd
    * [[graft.functions.FloatDotProduct]]; the centroid matrix is
    * nCells × dim floats — driver-tiny, shipped in the plan. Shared by the
    * fit's assignment step and the query-side probe ranking, so the two
    * can never disagree on cell geometry.
    */
  private def centerDistStructs(vecCol: Column, centers: Array[Array[Float]]): Seq[Column] = {
    // every per-center constant travels as an ARRAY-literal reference, not
    // an inlined primitive literal: codegen inlines primitive literals into
    // the generated source, so per-iteration centers would force a fresh
    // Janino compile of the (large) assignment/agg classes on EVERY Lloyd
    // iteration — with references the source is iteration-invariant and the
    // generated-class cache hits.
    val c2s = typedlit(centers.map(_.map(x => x.toDouble * x.toDouble).sum).toSeq)
    centers.toSeq.zipWithIndex.map { case (ctr, i) =>
      struct((element_at(c2s, i + 1)
        - lit(2.0) * float_dot(vecCol, typedlit(ctr.toSeq))).as("d"),
        lit(i).as("cell"))
    }
  }

  /** Nearest-centroid cell id (ties broken by cell index — the struct sort
    * orders (d, cell) lexicographically).
    */
  def nearestCell(vecCol: Column, centers: Array[Array[Float]]): Column =
    element_at(array_sort(array(centerDistStructs(vecCol, centers): _*)), 1)
      .getField("cell")

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
    * Driver state is nCells×dim floats per iteration — the "model is tiny,
    * data is huge" shape that makes IVF work at 100 TB (each iteration is
    * one map-side-combinable aggregation over the corpus).
    */
  def fitIvfCenters(emb: DataFrame, nCells: Int, iters: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding"): Array[Array[Float]] = {
    import org.apache.spark.sql.types.DecimalType
    var centers: Array[Array[Float]] = emb
      .orderBy(xxhash64(col(idCol)), col(idCol)).limit(nCells)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).toArray)
    val dim = centers.headOption.map(_.length).getOrElse(return centers)
    // one dsum per dimension in a single groupBy — map-side combinable, the
    // shuffle carries nCells × (dim decimals) rows, never a dim× row
    // explosion (same shape as MinHash's 32 min-aggs in one pass).
    // DECIMAL(18,10) stays within Spark's compact-Long decimal range (≤18
    // digits) — sums run as primitive long arithmetic, not BigDecimal.
    // Headroom: 10^8 unit-scale values per cell before overflow; a corpus
    // beyond that would fit centroids on a deterministic sample anyway.
    val dimSums = (0 until dim).map(j =>
      sum(element_at(col(vecCol), j + 1).cast(DecimalType(18, 10))).as(s"__s$j"))
    for (_ <- 1 to iters) {
      val rows = emb
        .withColumn("__cell", nearestCell(col(vecCol), centers))
        .groupBy("__cell")
        .agg(count(lit(1)).as("__n"), dimSums: _*)
        .collect()
      val next = centers.map(_.clone()) // empty cells keep their center
      rows.foreach { r =>
        val cell = r.getInt(0)
        val n = r.getLong(1)
        var j = 0
        while (j < dim) {
          next(cell)(j) = (r.getDecimal(2 + j).doubleValue() / n).toFloat
          j += 1
        }
      }
      centers = next
    }
    centers
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
  def ivfCosineTopK(emb: DataFrame, queryPred: Column, k: Int = 5, nCells: Int = 16,
      nprobe: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val centers = fitIvfCenters(emb, nCells, idCol = idCol, vecCol = vecCol)
    val e = emb
      .withColumn("ivf_cell", nearestCell(col(vecCol), centers))
      .withColumn("__nrm", float_norm(col(vecCol)))
    val c = e.select(col("ivf_cell"), col(idCol).as("c_id"),
      col(vecCol).as("c_emb"), col("__nrm").as("c_n"))
    // query-side multi-probe: the nprobe (dist, cell) structs with the
    // smallest distance explode into one probe row each.
    val q = e.filter(queryPred)
      .withColumn("__probe", explode(slice(
        array_sort(array(centerDistStructs(col(vecCol), centers): _*)), 1, nprobe)))
      .select(col("__probe.cell").as("ivf_cell"), col(idCol).as("q_id"),
        col(vecCol).as("q_emb"), col("__nrm").as("q_n"))
    // a candidate lives in exactly ONE cell, so probe fan-out never
    // duplicates a (q, c) pair — the shared top-k tail applies unchanged.
    topKJoin(q, c, k, Seq("ivf_cell"))
  }
}
