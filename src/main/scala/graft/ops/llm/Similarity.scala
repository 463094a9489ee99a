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
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("c_id"))
    q.join(c, Seq(blockCol)).filter(col("q_id") =!= col("c_id"))
      .withColumn("score", round(float_dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4))
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
    */
  def hyperplanes(bits: Int = 8, dim: Int = 64): Array[Array[Float]] =
    Array.tabulate(bits, dim) { (i, j) =>
      ((mix(i.toLong * 1000003L + j) % 1000L) / 1000.0).toFloat
    }

  def hyperplaneBuckets(emb: DataFrame, bits: Int = 8, dim: Int = 64,
      vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(bits, dim)
    val sigBits = (0 until bits).map { i =>
      val proj = graft.functions.VectorFunctions.float_dot(
        col(vecCol), typedlit(planes(i).toSeq))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }
    emb.withColumn("lsh_bucket", sigBits.reduce((a, b) => a.bitwiseOR(b)))
  }

  /** Top-k within LSH buckets — the scale path. Recall is tunable via
    * `bits` (fewer bits → bigger buckets → higher recall, more compute).
    */
  def lshCosineTopK(emb: DataFrame, queryPred: Column, k: Int = 5, bits: Int = 8,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    cosineTopK(hyperplaneBuckets(emb, bits, vecCol = vecCol), queryPred, k, "lsh_bucket", idCol, vecCol)

  /** IVF (inverted-file) coarse quantization: fit KMeans centroids (fixed
    * seed → deterministic), assign each vector to its nearest centroid,
    * then search only within the probe cell. The classic ANN index shape:
    * the fit touches a sample-sized driver model, the assignment and the
    * per-cell search are fully distributed. `nCells` trades recall for
    * compute exactly like IVF nlist.
    */
  def ivfCosineTopK(emb: DataFrame, queryPred: Column, k: Int = 5, nCells: Int = 16,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = emb.withColumn("__mlvec", array_to_vector(col(vecCol)))
    // 5 Lloyd iterations: IVF only needs a coarse partition of the space
    // (recall comes from the per-cell search, not centroid quality) — the
    // default 20 iterations quadruple the fit cost for no recall gain.
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("__mlvec").setPredictionCol("ivf_cell")
      .fit(withVec)
    val assigned = model.transform(withVec).drop("__mlvec")
    cosineTopK(assigned, queryPred, k, "ivf_cell", idCol, vecCol)
  }
}
