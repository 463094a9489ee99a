package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphAnalytics

/** GraphX wrappers verified on hand-computed graphs + the invariants
  * SURVEY.md §2.2 prescribes for the iterative (non-oracle) algorithms.
  */
class GraphAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // triangle 1-2-3 with a tail 3-4, plus isolated pair 5-6
  private lazy val v = (1L to 6L).map(i => (i, "x", s"v$i")).toDF("id", "label", "name")
  private lazy val e = Seq((1L, 2L, "e"), (2L, 3L, "e"), (1L, 3L, "e"),
    (3L, 4L, "e"), (5L, 6L, "e")).toDF("src", "dst", "label")

  test("pageRank invariant: ranks sum to ≈ |V| (normalized PageRank)") {
    val ranks = GraphAnalytics.pageRank(v, e).agg(sum("rank")).head().getDouble(0)
    assert(math.abs(ranks - 6.0) < 0.1, s"sum(rank)=$ranks")
  }

  test("deterministic pageRankDF agrees with GraphX staticPageRank and is layout-invariant") {
    val gx = GraphAnalytics.pageRank(v, e).as[(Long, Double)].collect().toMap
    val df = GraphAnalytics.pageRankDF(v, e).as[(Long, Double)].collect().toMap
    assert(df.keySet == gx.keySet)
    df.foreach { case (id, r) =>
      assert(math.abs(r - gx(id)) < 1e-4, s"vertex $id: df=$r gx=${gx(id)}")
    }
    val shuffled = GraphAnalytics.pageRankDF(v.repartition(7), e.repartition(5))
      .as[(Long, Double)].collect().toMap
    assert(shuffled == df, "pageRankDF values changed under repartitioning")
  }

  test("eigenvectorDF: hand-traced renormalized power iteration, layout-invariant") {
    // 3-cycle with a chord (1→2→3→1 plus 1→3): strongly connected, so
    // mass persists and the renormalized iterate has a nontrivial fixpoint
    val cv = Seq(1L, 2L, 3L).map(i => (i, "x", s"v$i")).toDF("id", "label", "name")
    val ce = Seq((1L, 2L, "e"), (2L, 3L, "e"), (3L, 1L, "e"), (1L, 3L, "e"))
      .toDF("src", "dst", "label")
    // in-degrees: 1←3; 2←1; 3←{2,1}. Mimic the engine's ladder exactly:
    // floor(x·1e6) PER MESSAGE, exact long sum, /1e6, exact DECIMAL(18,6)
    // total, round(y·n/t, 6) — same op order, same string-repr BigDecimal
    // rounding as Spark's round()/decimal cast.
    def step(x: Map[Long, Double]): Map[Long, Double] = {
      def fl(v: Double): Long = math.floor(v * 1e6).toLong
      val units = Map(1L -> fl(x(3L)), 2L -> fl(x(1L)),
        3L -> (fl(x(2L)) + fl(x(1L))))
      val y = units.map { case (k, u) => k -> u.toDouble / 1e6 }
      val t = y.values
        .map(v => BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      y.map { case (k, v) =>
        k -> BigDecimal(v * 3 / t)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    var exp = Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    for (_ <- 1 to 8) exp = step(exp)
    val got = GraphAnalytics.eigenvectorDF(cv, ce, 8)
      .as[(Long, Double)].collect().toMap
    got.foreach { case (id, x) =>
      assert(math.abs(x - exp(id)) < 2e-6, s"vertex $id: got=$x exp=${exp(id)}")
    }
    val shuffled = GraphAnalytics.eigenvectorDF(cv.repartition(5), ce.repartition(3), 8)
      .as[(Long, Double)].collect().toMap
    assert(shuffled == got, "eigenvectorDF values changed under repartitioning")
    // Σx = |V| after every renormalized round (allowing 6dp round drift)
    assert(math.abs(got.values.sum - 3.0) < 1e-4)
  }

  test("connected components: two components with the expected membership") {
    val cc = GraphAnalytics.connectedComponents(v, e)
      .groupBy("component").agg(count(lit(1)).as("n"))
      .orderBy("component").as[(Long, Long)].collect().toSeq
    assert(cc == Seq((1L, 4L), (5L, 2L))) // GraphX labels by min vertex id
  }

  test("lpaDF: hand-traced supersteps on a known graph, layout-invariant") {
    // Sync LPA with min-label tie-break, 5 rounds, labels init = id:
    // the triangle+tail component collapses onto label 1 by round 3; the
    // isolated pair 5-6 oscillates with period 2 (classic bipartite LPA),
    // so after an odd round v5 holds 6 and v6 holds 5.
    val got = GraphAnalytics.lpaDF(v.select("id"), e.select("src", "dst"), 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 6L, 6L -> 5L))
    val shuffled = GraphAnalytics.lpaDF(
      v.repartition(7).select("id"), e.repartition(5).select("src", "dst"), 5)
      .as[(Long, Long)].collect().toMap
    assert(shuffled == got, "lpaDF changed under repartitioning")
  }

  test("lpaDF vs GraphX LPA: identical community PARTITION on a tie-free graph") {
    // Two clean stars (hub 1 w/ leaves 2-4, hub 10 w/ leaves 11-13): no
    // count ties after round 1, so the induced partition must agree even
    // though GraphX's tie-break is order-unstable in general.
    val sv = (Seq(1L, 10L) ++ (2L to 4L) ++ (11L to 13L)).map(i => (i, "x", s"v$i"))
      .toDF("id", "label", "name")
    val se = ((2L to 4L).map(l => (1L, l, "e")) ++ (11L to 13L).map(l => (10L, l, "e")))
      .toDF("src", "dst", "label")
    def partition(df: org.apache.spark.sql.DataFrame): Set[Set[Long]] =
      df.as[(Long, Long)].collect().groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val mine = partition(GraphAnalytics.lpaDF(sv.select("id"), se.select("src", "dst"), 4))
    val gx = partition(GraphAnalytics.labelPropagation(
      GraphAnalytics.toGraphX(sv, se), 4))
    assert(mine == gx, s"partitions differ: $mine vs $gx")
  }

  test("graph_cc oracle convergence: bounded min-label rounds == GraphX CC on the real derived graph") {
    // The oracle replays CC as CcRounds of min-label propagation; this is
    // only equal to true CC if the rounds cover the eccentricity of each
    // component's argmin vertex. Prove it on the actual graph family the
    // query runs over (topology — hence diameter — is SF-invariant).
    val d = "/root/testdata/sf0.001"
    val g = graft.model.DerivedGraph(spark, d)
    val ed = g.edges.select("src", "dst")
    val und = ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
      .toDF("a", "b").localCheckpoint()
    var lbl = g.vertices.select(col("id"), col("id").as("lbl"))
    for (_ <- 1 to QueriesGraphX.CcRounds) {
      val m = und.join(lbl, col("b") === col("id"))
        .groupBy("a").agg(min("lbl").as("ml"))
        .select(col("a").as("id"), col("ml"))
      lbl = lbl.join(m, Seq("id"), "left")
        .select(col("id"), least(col("lbl"), coalesce(col("ml"), col("lbl"))).as("lbl"))
        .localCheckpoint()
    }
    val bounded = lbl.as[(Long, Long)].collect().toMap
    val gx = GraphAnalytics.connectedComponents(GraphAnalytics.derivedGraphX(spark, d))
      .as[(Long, Long)].collect().toMap
    assert(bounded == gx,
      s"bounded min-label (${QueriesGraphX.CcRounds} rounds) disagrees with GraphX CC on ${
        bounded.count { case (k, v) => gx.get(k).exists(_ != v) }} vertices")
  }

  test("kCoreDF: K4 plus pendant tail — the 3-core is exactly the K4") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)).toDF("src", "dst")
    val got = GraphAnalytics.kCoreDF(edges, k = 3, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCoreDF: pendant chain peels one layer per round — rounds bound is real") {
    // path 1-2-…-8: the 2-core is empty, but each round only removes the
    // two current endpoints, so 3 rounds leave a residue while 4 suffice.
    val path = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    assert(GraphAnalytics.kCoreDF(path, k = 2, rounds = 3).count() > 0)
    assert(GraphAnalytics.kCoreDF(path, k = 2, rounds = 4).count() == 0)
  }

  test("graph_kcore oracle convergence: one extra round changes nothing on the real derived graph") {
    val d = "/root/testdata/sf0.001"
    val edges = graft.model.DerivedGraph(spark, d).edges.select("src", "dst")
    val atBound = GraphAnalytics.kCoreDF(edges, k = 8, rounds = QueriesGraphX.KcoreRounds)
      .as[(Long, Long)].collect().toMap
    val oneMore = GraphAnalytics.kCoreDF(edges, k = 8, rounds = QueriesGraphX.KcoreRounds + 1)
      .as[(Long, Long)].collect().toMap
    assert(atBound == oneMore, "peel had not converged within the oracle's round bound")
    assert(atBound.nonEmpty && atBound.values.forall(_ >= 8L))
  }

  test("triangle count on a known graph") {
    val canonical = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (5L, 6L))
      .toDF("src", "dst")
    assert(GraphAnalytics.triangleCount(canonical) == 1L)
  }

  test("DataFrame degree-ordered triangle count agrees with GraphX") {
    // K4 on 1-4 (4 triangles) + triangle 5-6-7 + tail 7-8
    val canonical = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L), (7L, 8L)).toDF("src", "dst")
    assert(GraphAnalytics.triangleCountDF(canonical) == 5L)
    // the broadcast-hinted plan (the bench opt-in) counts identically
    assert(GraphAnalytics.triangleCountDF(canonical, broadcastSides = true) == 5L)
    assert(GraphAnalytics.triangleCountDF(canonical) ==
      GraphAnalytics.triangleCount(canonical))
  }

  test("triangleListDF enumerates each triangle exactly once, canonically") {
    // same fixture as the count test: K4 (4 triangles) + triangle 5-6-7
    val canonical = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (6L, 7L), (5L, 7L), (7L, 8L))
      .toDF("src", "dst").select($"src".as("a"), $"dst".as("b"))
    val rows = GraphAnalytics.triangleListDF(canonical)
      .orderBy("x", "y", "z").as[(Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      (1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L), (5L, 6L, 7L)))
    // the broadcast-hinted plan (the bench/shared-cache opt-in) agrees,
    // and the list's cardinality IS the triangle count graph_triangles
    // now reads off the shared frame
    assert(GraphAnalytics.triangleListDF(canonical, broadcastSides = true)
      .count() == GraphAnalytics.triangleCountDF(
        canonical.select($"a".as("src"), $"b".as("dst"))))
  }

  test("bfs distances on a path with an unreachable pair") {
    val dists = GraphAnalytics.bfsDistances(e, seed = 1L)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(dists == Seq((1L, 0L), (2L, 1L), (3L, 1L), (4L, 2L))) // 5,6 unreachable
  }

  test("multiSourceBfs: one traversal equals a per-landmark bfsDistances run") {
    // random undirected graph; every landmark's distance map must match
    // the single-source Pregel exactly (including omitted unreachables).
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(40)((rnd.nextInt(20).toLong + 1, rnd.nextInt(20).toLong + 1))
      .filter { case (a, b) => a != b }.distinct
      .toDF("src", "dst").withColumn("label", lit("e"))
    val verts = (1L to 20L).map(i => (i, "x", s"v$i")).toDF("id", "label", "name")
    val g = GraphAnalytics.toGraphX(verts, edges)
    val landmarks = Seq(1L, 7L, 13L)
    val multi = GraphAnalytics.multiSourceBfs(g, landmarks, 10)
      .as[(Long, Long, Long)].collect().toSet
    val singles = landmarks.flatMap { lm =>
      GraphAnalytics.bfsDistances(g, lm, 10).as[(Long, Long)].collect()
        .map { case (id, d) => (id, lm, d) }
    }.toSet
    assert(multi == singles)
  }

  test("degreeAssortativity: a star is perfectly disassortative (r = -1)") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val r = GraphAnalytics.degreeAssortativity(star).head()
    assert(r.getLong(0) == 6L) // 3 edges × both orientations
    assert(r.getDouble(1) == -1.0)
  }

  test("degreeAssortativity: hand-computed mixed graph") {
    // path A-B-C plus pendant D on B: degrees A=1, B=3, C=1, D=1
    // und pairs (x,y): (1,3)×3, (3,1)×3 → r = -1; add edge C-D:
    // degrees become A=1, B=3, C=2, D=2 — no longer extremal
    val g = Seq((1L, 2L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("src", "dst")
    val r = GraphAnalytics.degreeAssortativity(g).head()
    assert(r.getLong(0) == 8L)
    // power sums by hand: pairs (1,3),(3,1),(3,2),(2,3),(3,2),(2,3),(2,2),(2,2)
    // n=8 Σx=18 Σy=18 Σxy=38 Σx²=44 Σy²=44
    // r = (8·38−324)/(8·44−324) = (304−324)/(352−324) = −20/28
    assert(r.getDouble(1) == math.rint(-20.0 / 28.0 * 1e6) / 1e6)
  }
}
