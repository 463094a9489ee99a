package graft

import org.apache.spark.sql.functions._
import graft.ops.llm.{Dedup, Similarity}

/** ANN variants against the brute-force baseline on the real embeddings
  * fixture, plus near-dup detection behavior.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.model.Tables(spark, "/root/testdata/sf0.001", "embeddings")
  private val pred = col("vec_id") % 50 === 0

  private def topPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.filter(col("rk") === 1).select("q_id", "c_id").as[(Long, Long)].collect().toSet

  test("LSH top-k is a subset-quality approximation: scores never exceed brute force") {
    val brute = Similarity.cosineTopK(emb, pred).filter(col("rk") === 1)
      .select("q_id", "score").as[(Long, Double)].collect().toMap
    val lsh = Similarity.lshCosineTopK(emb, pred).filter(col("rk") === 1)
      .select("q_id", "score").as[(Long, Double)].collect().toMap
    // every LSH best-hit score is <= the true best for that query
    lsh.foreach { case (q, s) => brute.get(q).foreach(bs => assert(s <= bs + 1e-9)) }
  }

  test("IVF top-k: deterministic across runs, scores bounded by GLOBAL brute force") {
    val a = topPairs(Similarity.ivfCosineTopK(emb, pred, nCells = 4))
    val b = topPairs(Similarity.ivfCosineTopK(emb, pred, nCells = 4))
    assert(a == b) // fixed seed → same cells → same results
    // IVF cells span labels, so the bound must come from an unblocked
    // (single-cell) brute force, not the label-blocked baseline.
    val globalBrute = Similarity.cosineTopK(emb.withColumn("all", lit(1)), pred,
      blockCol = "all").filter(col("rk") === 1)
      .select("q_id", "score").as[(Long, Double)].collect().toMap
    val ivf = Similarity.ivfCosineTopK(emb, pred, nCells = 4).filter(col("rk") === 1)
      .select("q_id", "score").as[(Long, Double)].collect().toMap
    ivf.foreach { case (q, s) => globalBrute.get(q).foreach(bs => assert(s <= bs + 1e-9)) }
  }

  test("embeddingNearDups finds identical vectors at threshold 1.0") {
    val dup = emb.limit(1).withColumn("vec_id", col("vec_id") + 100000)
    val withDup = emb.unionByName(dup)
    val pairs = Dedup.embeddingNearDups(withDup, threshold = 0.9999)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.exists { case (a, b) => b == a + 100000 })
  }
}
