package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-augmented-generation indexing pipeline composed end to end:
  * sliding-window chunking ([[Packing.chunkDocs]]) → deterministic
  * hash-feature chunk embeddings ([[hashEmbed]]) → cosine top-k retrieval
  * for a query batch. This is the corpus→index→retrieve shape every RAG
  * deployment runs; here the embedder is feature hashing (Weinberger et
  * al., "Feature Hashing for Large Scale Multitask Learning", ICML 2009)
  * rather than a neural model — deterministic, model-free, and replayable
  * in the DuckDB oracle, while exercising the exact same plumbing (vector
  * column, norms, blocked top-k) a learned embedding would.
  *
  * Scale shape: chunking is a zero-shuffle explode; embedding is one
  * map-side-combinable groupBy per chunk (exact LONG feature sums — order
  * independent); retrieval broadcasts the QUERY batch (small by
  * construction — it's the question set) against the chunk index, so the
  * corpus never shuffles. Past broadcast-sized query batches, swap the
  * final stage for [[Similarity.lshCosineTopK]] over the same vectors —
  * the declared at-scale ANN path.
  */
object Rag {

  /** Embedding dimensionality of the hash featurizer. */
  val Dims: Int = 8

  /** Defaults of the declared `rag_retrieval` query — the generated oracle
    * SQL derives every literal from THESE values (chunk geometry, top-k,
    * eval-slice modulus), so implementation and oracle cannot silently
    * diverge.
    */
  val ChunkSize: Int = 64
  val Overlap: Int = 16
  val TopK: Int = 3
  val EvalMod: Int = 50

  /** Affine constants of the per-dimension token-hash transforms — drawn
    * from the same splitmix64-derived universal family as MinHash but at
    * disjoint indices (100+), so the two sketches are independent. Shared
    * with the generated oracle SQL.
    */
  val featureConstants: Seq[(Long, Long)] =
    Dedup.universalConstants(100 + Dims).drop(100)

  private val center: Long = (Dedup.P - 1) / 2

  /** Deterministic bag-of-tokens hash embedding: dimension j is the exact
    * LONG sum over tokens of ((a_j·fold(tok) + b_j) mod P − (P−1)/2),
    * cast to FLOAT — a seedless random projection of the token multiset.
    * Exact integer sums commute, so the embedding is partitioning-
    * invariant; the FLOAT cast is IEEE round-to-nearest on both engines.
    */
  def hashEmbed(rows: DataFrame, textCol: String, keyCols: Seq[String]): DataFrame = {
    val toks = rows
      .select(keyCols.map(col) :+ explode(split(col(textCol), " ")).as("__tok"): _*)
      .withColumn("__h", graft.functions.TextHash.poly_fold(col("__tok"), Dedup.P))
    val aggs = featureConstants.zipWithIndex.map { case ((a, b), j) =>
      sum((lit(a) * col("__h") + lit(b)) % lit(Dedup.P) - lit(center)).as(s"__f$j")
    }
    toks.groupBy(keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("embedding",
        array(featureConstants.indices.map(j => col(s"__f$j").cast("float")): _*))
      .drop(featureConstants.indices.map(j => s"__f$j"): _*)
  }

  /** Index the non-eval corpus as chunk embeddings and retrieve the top-k
    * chunks per eval ("query") document by 4dp-rounded cosine. Zero-norm
    * vectors (structurally possible only for degenerate token sets) are
    * excluded on both sides before ranking.
    */
  def retrieve(docs: DataFrame, queryPred: Column, k: Int = TopK,
      chunkSize: Int = ChunkSize, overlap: Int = Overlap,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import graft.functions.VectorFunctions.{float_dot, float_norm}
    val corpus = hashEmbed(
      Packing.chunkDocs(docs.filter(!queryPred), chunkSize, overlap, textCol, idCol),
      "chunk_text", Seq(idCol, "chunk_id"))
      .withColumn("__nrm", float_norm(col("embedding")))
      .filter(col("__nrm") > 0)
      .select(col(idCol).as("c_doc"), col("chunk_id"),
        col("embedding").as("c_emb"), col("__nrm").as("c_n"))
    val queries = hashEmbed(docs.filter(queryPred), textCol, Seq(idCol))
      .withColumn("__nrm", float_norm(col("embedding")))
      .filter(col("__nrm") > 0)
      .select(col(idCol).as("q_doc"), col("embedding").as("q_emb"), col("__nrm").as("q_n"))
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col("q_doc"), col("c_doc"), col("chunk_id"),
        round(float_dot(col("q_emb"), col("c_emb")) / (col("q_n") * col("c_n")), 4)
          .as("score"))
    val w = Window.partitionBy("q_doc")
      .orderBy(col("score").desc, col("c_doc"), col("chunk_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("q_doc", "rk", "c_doc", "chunk_id", "score")
  }
}
