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

  test("cosineTopKGlobal matches the constant-block brute force row for row") {
    // the parallel truth path (broadcast query side + two-level rank cut)
    // must be VALUE-identical to the single-partition constant-block form
    // it replaced on the similarity_ivf_recall truth side — same rows,
    // same ranks, same rounded scores, at a block count that forces the
    // per-block pre-cut to actually discard rows (k=3, 8 blocks over
    // ~120 candidates) and on the real fixture's tie patterns.
    val serial = Similarity.cosineTopK(emb.withColumn("all", lit(1)), pred,
      k = 3, blockCol = "all")
      .select("q_id", "rk", "c_id", "score").as[(Long, Long, Long, Double)]
      .collect().toSet
    val parallel = Similarity.cosineTopKGlobal(emb, pred, k = 3, blocks = 8)
      .select("q_id", "rk", "c_id", "score").as[(Long, Long, Long, Double)]
      .collect().toSet
    assert(parallel == serial)
  }

  test("IVF on an EMPTY corpus returns an empty frame with the contract schema") {
    val empty = emb.where(lit(false))
    val out = Similarity.ivfCosineTopK(empty, pred, nCells = 4)
    assert(out.columns.toSeq == Seq("q_id", "rk", "c_id", "score"))
    assert(out.count() == 0)
  }

  test("ragged vectors are excluded from the fit, not crashed on") {
    // one truncated and one null embedding mixed into the corpus: the fit
    // must not NPE and must still produce full-dim centers.
    val ragged = emb.limit(2).select(
      (col("vec_id") + 200000).as("vec_id"), col("label"),
      when(col("vec_id") % 2 === 0, slice(col("embedding"), 1, 3))
        .otherwise(lit(null)).as("embedding"))
    val centers = Similarity.fitIvfCenters(emb.unionByName(ragged), nCells = 4)
    assert(centers.length == 4)
    centers.foreach(c => assert(c.length == 64))
  }

  test("embeddingNearDups finds identical vectors at threshold 1.0") {
    val dup = emb.limit(1).withColumn("vec_id", col("vec_id") + 100000)
    val withDup = emb.unionByName(dup)
    val pairs = Dedup.embeddingNearDups(withDup, threshold = 0.9999)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.exists { case (a, b) => b == a + 100000 })
  }

  // ---- recall guarantees, on a CLUSTERED fixture -------------------------
  // The sf embeddings are near-uniform random 64-dim vectors: cosine
  // near-neighbors barely exist there (curse of dimensionality), so recall
  // against them measures the data, not the index. ANN indexes exist for
  // data WITH neighborhood structure — this fixture plants it: 20 tight
  // clusters (unit center + 0.02σ per-dim noise → pairwise intra-cluster
  // cosine ≈ 0.97), fixed seed, so each vector's true top-5 is in-cluster
  // and recall is a property of the index mechanics (for 8-bit hyperplane
  // tables: p_collide ≈ (1 − θ/π)^8 ≈ 0.55 per table → 4-table
  // OR-amplification ≈ 0.96).
  private lazy val clustered = {
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Array.fill(20)(unit(Array.fill(64)(rnd.nextGaussian().toFloat)))
    val rows = for (c <- 0 until 20; i <- 0 until 25) yield {
      val v = unit(centers(c).map(x => x + 0.02f * rnd.nextGaussian().toFloat))
      (c.toLong * 25 + i, c, v)
    }
    rows.toDF("vec_id", "label", "embedding")
  }
  private val cpred = col("vec_id") % 25 === 0 // one query per cluster

  private def top5(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "c_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }

  private def recall(got: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double =
    truth.map { case (q, ts) =>
      got.getOrElse(q, Set.empty).intersect(ts).size.toDouble / ts.size
    }.sum / truth.size

  private lazy val clusteredTruth = top5(Similarity.cosineTopK(
    clustered.withColumn("all", lit(1)), cpred, blockCol = "all"))

  test("IVF multi-probe: recall@5 >= 0.95 on clustered data, and strictly above nprobe=1") {
    val multi = recall(top5(Similarity.ivfCosineTopK(clustered, cpred,
      nCells = 16, nprobe = 3)), clusteredTruth)
    val single = recall(top5(Similarity.ivfCosineTopK(clustered, cpred,
      nCells = 16, nprobe = 1)), clusteredTruth)
    assert(multi >= 0.95, s"nprobe=3 recall $multi")
    assert(multi >= single, s"multi-probe must not lose recall ($multi vs $single)")
  }

  test("LSH OR-amplification: tables=4 recall >= tables=1, and >= 0.9 on clustered data") {
    val one = recall(top5(Similarity.lshCosineTopK(clustered, cpred, tables = 1)),
      clusteredTruth)
    val four = recall(top5(Similarity.lshCosineTopK(clustered, cpred, tables = 4)),
      clusteredTruth)
    assert(four >= one, s"OR-amplification lost recall: $four < $one")
    assert(four >= 0.9, s"tables=4 recall $four")
  }

  test("multi-table LSH candidates dominate single-table: per-query best score never drops") {
    // table 0 of the multi-table scheme IS the single table (plane index
    // = table·bits + i), so every single-table candidate pair also meets in
    // the multi-table join — the per-query best-hit score is monotone in
    // the table count.
    def best(tables: Int): Map[Long, Double] =
      Similarity.lshCosineTopK(emb, pred, tables = tables).filter(col("rk") === 1)
        .select("q_id", "score").as[(Long, Double)].collect().toMap
    val one = best(1)
    val four = best(4)
    one.foreach { case (q, s) =>
      assert(four.contains(q) && four(q) >= s - 1e-9,
        s"query $q: tables=4 best ${four.get(q)} < tables=1 best $s")
    }
  }

  test("similarity_ivf_recall: internally consistent, and its late-bound oracle appears after the run") {
    val rows = Queries.all("similarity_ivf_recall")
      .fn(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTrue, nHit) = (r.getAs[Long]("n_true"), r.getAs[Long]("n_hit"))
      val recall = r.getAs[Double]("recall")
      assert(nTrue == 5L)
      assert(nHit >= 0L && nHit <= nTrue)
      assert(math.abs(recall - nHit.toDouble / nTrue) < 1e-9)
      // rank displacement only accumulates over hits: bounded by hits ×
      // the max per-hit displacement (|i_rk − t_rk| ≤ k − 1 = 4)
      assert(r.getAs[Long]("rank_err") <= nHit * 4)
    }
    // the run above captured the fitted centers → the late-bound oracle
    // must now materialize, embedding them as double literals
    val sql = SparkEntry.oracleSql.get("similarity_ivf_recall")
    assert(sql.isDefined, "late-bound IVF oracle absent after the query ran")
    assert(sql.get.contains("list_dot_product"))
  }
}
