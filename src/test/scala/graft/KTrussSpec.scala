package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the incremental k-truss peel to the per-round RECOMPUTE form the
  * SQL oracle replays, on graphs engineered to exercise the delta
  * arithmetic: single-removal decrements, the DOUBLE-removal
  * inclusion-exclusion correction, multi-round cascades, and the
  * triangle-less-edge convention.
  */
class KTrussSpec extends SparkSpec {
  import spark.implicits._

  /** Naive bounded recompute peel — the oracle's form, trusted here
    * because each round is a direct transcription of the definition. */
  private def recompute(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    def support(t: DataFrame): DataFrame = {
      val u = t.select(col("a").as("x"), col("b").as("y"))
        .unionAll(t.select(col("b").as("x"), col("a").as("y")))
      t.join(u.as("u1"), col("u1.x") === col("a"))
        .join(u.as("u2"),
          col("u2.x") === col("b") && col("u2.y") === col("u1.y"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
    }
    var t = edges.localCheckpoint()
    for (_ <- 1 to rounds)
      // cut per round — each support() references t three times, so an
      // un-cut chain inlines 3^rounds copies (the graph_cc oracle lesson)
      t = support(t).filter(col("support") >= k - 2).select("a", "b")
        .localCheckpoint()
    support(t)
  }

  private def assertMatches(edges: DataFrame, k: Int, rounds: Int): Unit = {
    val inc = graft.ops.GraphAnalytics.kTrussDF(edges, k, rounds)
      .select("a", "b", "support")
    val ref = recompute(edges, k, rounds)
    assert(inc.count() == ref.count(),
      s"row counts differ: inc=${inc.count()} ref=${ref.count()}")
    val diff = inc.join(ref.withColumnRenamed("support", "__s"), Seq("a", "b"))
      .filter(col("support") =!= col("__s"))
    assert(diff.isEmpty, s"${diff.count()} support mismatches")
  }

  test("K5 with a pendant triangle: double-removal correction exercised") {
    // pendant edges (1,6),(2,6) have support 1 -> both removed in round 1;
    // their shared triangle {1,2,6} must decrement surviving edge (1,2)
    // exactly ONCE (t1 charges it twice, t2 corrects once)
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val edges = (k5 ++ Seq((1L, 6L), (2L, 6L))).toDF("a", "b")
    assertMatches(edges, k = 4, rounds = 5)
    val r = graft.ops.GraphAnalytics.kTrussDF(edges, 4, 5)
      .orderBy("a", "b").as[(Long, Long, Long)].collect()
    // the 4-truss is exactly K5: 10 edges, each in 3 triangles
    assert(r.length == 10 && r.forall(_._3 == 3L))
  }

  test("triangle strip cascades to empty over multiple rounds") {
    // triangles (i, i+1, i+2): skip edges die in round 1, path edges lose
    // their only triangles and die in round 2 — a multi-round cascade
    val n = 9L
    val path = (1L until n).map(i => (i, i + 1))
    val skip = (1L to n - 2).map(i => (i, i + 2))
    val edges = (path ++ skip).toDF("a", "b")
    assertMatches(edges, k = 4, rounds = 6)
    assert(graft.ops.GraphAnalytics.kTrussDF(edges, 4, 6).isEmpty)
  }

  test("incremental == recompute on the sf0.001 co-order graph, and an extra round is a no-op") {
    assume(new java.io.File("/root/testdata/sf0.001/lineitem.parquet").exists())
    val edges = graft.ops.GraphAnalytics
      .coOrderPartEdges(spark, "/root/testdata/sf0.001")
      .select(col("src").as("a"), col("dst").as("b")).localCheckpoint()
    assertMatches(edges, k = QueriesGraphX.TrussK, rounds = 3)
    val atBound = graft.ops.GraphAnalytics.kTrussDF(
      edges, QueriesGraphX.TrussK, QueriesGraphX.TrussRounds)
    val oneMore = graft.ops.GraphAnalytics.kTrussDF(
      edges, QueriesGraphX.TrussK, QueriesGraphX.TrussRounds + 1)
    assert(atBound.count() == oneMore.count())
  }

  test("mixed fixture: disjoint K4 islands joined by bridges peel correctly") {
    // two K4s (stable 4-trusses) bridged by a path — bridges and any
    // stray triangle on them must peel while both K4s survive intact
    val k4a = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val k4b = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val bridge = Seq((4L, 8L), (8L, 9L), (8L, 11L), (9L, 11L))
    val edges = (k4a ++ k4b ++ bridge).toDF("a", "b")
    assertMatches(edges, k = 4, rounds = 6)
    val r = graft.ops.GraphAnalytics.kTrussDF(edges, 4, 6)
    assert(r.count() == 12) // the two K4s, nothing else
  }
}
