package graft

import org.apache.spark.sql.functions._
import graft.ops.Traverse

/** Round-17 contracts: the gated containment sizes broadcast (VERDICT
  * r16 #1 — both paths pinned: in-bound hint broadcasts, forced-low bound
  * drops the hint with identical values), GRAFT_BCAST_LIMIT fail-fast
  * validation (ADVICE r16 #3), and the Bench warm-failure path (VERDICT
  * r16 #3 — failed steps surface by name, never as a summable sentinel).
  */
class R17OpsSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs = {
    // same fixture class as R16OpsSpec's plan test: enough shared 20-char
    // shingles that the containment output is non-empty
    val prefix = ('a' to 'z').mkString * 4
    val big = prefix + ("0123456789" * 30)
    val mid = ("qrstuvwxyz" * 12) + prefix.take(100)
    Seq((0L, prefix), (1L, big), (2L, mid), (3L, "zyxw" * 30))
      .toDF("doc_id", "text")
  }

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a +: flatten(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: flatten(q.plan)
      case n => Seq(n)
    }

  test("containment past the broadcast bound: hint dropped, values identical") {
    val docs = mkDocs
    val expect = graft.ops.llm.Dedup.containment(docs)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(expect.nonEmpty)
    // force the fallback: a zero doc bound drops the hint; disabling the
    // static AND adaptive auto-broadcast thresholds keeps AQE from
    // re-promoting the tiny test-scale sizes stage, so the executed plan
    // is the one a 10^10-doc corpus would get — no broadcast of sizes
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val out = graft.ops.llm.Dedup.containment(docs, broadcastDocLimit = 0L)
      val got = out.as[(Long, Long, Long, Double, Double)].collect().toSet
      assert(got == expect)
      val nodes = flatten(out.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[
          org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        s"sizes join still broadcast past the bound:\n${out.queryExecution.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("containment unknown-count path: the exact count keeps the hint") {
    // the sf30-tier regression shape (BENCHNOTES r17), re-pinned for gate
    // v3 (no byte proxy — ADVICE r17): with no caller-threaded count and
    // no optimizer rowCount, one exact docs.count() must decide, and a
    // real count at the bound keeps the broadcast
    val docs = mkDocs
    val out = graft.ops.llm.Dedup.containment(docs, broadcastDocLimit = 4L)
    out.collect()
    assert(flatten(out.queryExecution.executedPlan).exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"exact-count gate did not keep the hint at the bound:\n" +
        out.queryExecution.executedPlan)
  }

  test("containment in-bound: the sizes hint broadcasts (default-path guard)") {
    // the gate must not break the r16 plan shape at probe scale: a tiny
    // doc table (bytes/8 well under any session bound) keeps the hint
    val out = graft.ops.llm.Dedup.containment(mkDocs)
    out.collect()
    assert(flatten(out.queryExecution.executedPlan).exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]))
  }

  test("GRAFT_BCAST_LIMIT validation fails fast with a named message") {
    val e = intercept[IllegalArgumentException](Traverse.parseBcastLimit("25M"))
    assert(e.getMessage.contains("GRAFT_BCAST_LIMIT"))
    val z = intercept[IllegalArgumentException](Traverse.parseBcastLimit("0"))
    assert(z.getMessage.contains("GRAFT_BCAST_LIMIT"))
    assert(Traverse.parseBcastLimit(" 1000000 ") == 1000000L)
  }

  test("kHopIdsAdj chunked big-frontier fallback is exact (parity with Bloom)") {
    // mirror of R15OpsSpec's Bloom-path test: broadcastLimit=1 forces the
    // over-limit branch on every hop; the chunked strategy slices the
    // frontier by bucket group and must visit exactly the same ids
    import graft.model.DerivedGraph
    val edges = Seq((1L, 2L, "e"), (1L, 3L, "e"), (2L, 4L, "e"),
      (3L, 5L, "e"), (4L, 6L, "e"), (7L, 8L, "e")).toDF("src", "dst", "label")
    val und = DerivedGraph.undirected(edges)
      .withColumn("bk", pmod(col("a"), lit(4L)).cast("int"))
    val adj = DerivedGraph.Adj(und, und, 4)
    val ref = Traverse.kHopIds(edges, 1L, 3).as[Long].collect().toSet
    sys.props("graft.khop.fallback") = "chunked"
    try {
      val got = Traverse.kHopIdsAdj(adj, 1L, 3, broadcastLimit = 1L)
        .as[Long].collect().toSet
      assert(got == ref && ref == Set(1L, 2L, 3L, 4L, 5L, 6L))
    } finally sys.props.remove("graft.khop.fallback")
    val bad = intercept[IllegalArgumentException] {
      sys.props("graft.khop.fallback") = "magic"
      try Traverse.kHopIdsAdj(adj, 1L, 3, broadcastLimit = 1L).count()
      finally sys.props.remove("graft.khop.fallback")
    }
    assert(bad.getMessage.contains("GRAFT_KHOP_FALLBACK"))
  }

  test("hop join on (a, bk) dynamic-partition-prunes the adjacency scan") {
    // the mechanism behind the r17 lazy pruned hops (VERDICT r16 #5): a
    // broadcast frontier carrying its pmod bucket joins the partitioned
    // adjacency on (a, bk), and DPP pushes the frontier's ACTUAL bucket
    // set into the scan at runtime — no driver collect of bucket ids.
    // Pinned here against the real sf0.001 adjacency layout so a Spark
    // upgrade that stops firing DPP on this shape fails loudly.
    val sf001 = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf001)),
      "testdata sf0.001 not present")
    val adj = graft.model.DerivedGraph.undAdjacency(spark, sf001)
    val frontier = adj.full.select(col("a").as("id")).distinct()
      .orderBy("id").limit(3).localCheckpoint()
    val fab = frontier.select(col("id").as("a"),
      pmod(col("id"), lit(adj.buckets.toLong)).cast("int").as("bk"))
      .filter(col("bk") >= 0)
    val hop = adj.byBucket.join(broadcast(fab), Seq("a", "bk"))
    val rows = hop.collect().length
    assert(rows > 0)
    val plan = hop.queryExecution.executedPlan
    assert(plan.toString.contains("dynamicpruning"),
      s"DPP did not fire on the (a, bk) hop join:\n$plan")
    def walk(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case x => x }.flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case x => Seq(x)
      }
    val scanned = walk(plan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    }
    // ≤3 distinct seeds touch ≤3 of the 256 bucket directories — the scan
    // must have read the pruned set, not the whole layout
    assert(scanned.nonEmpty && scanned.forall(n => n >= 1L && n <= 3L),
      s"adjacency scan not runtime-pruned (numFiles=$scanned):\n$plan")
  }

  test("dpp pruned-hop form: traversal and walk parity with the collect default") {
    // GRAFT_KHOP_PRUNE=dpp is the lazy form kept replayable (it measured
    // slower — Traverse.prunedHopForm scaladoc); its rows must stay
    // identical to the default on both traversal families
    val sf001 = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf001)),
      "testdata sf0.001 not present")
    val adj = graft.model.DerivedGraph.undAdjacency(spark, sf001)
    val seeds = (1L to 4L).map(graft.model.DerivedGraph.CustomerBase + _).toDF("walk_id")
    val refHop = Traverse.kHopIdsAdj(adj, QueriesGraph.custSeed, 2)
      .as[Long].collect().toSet
    val refWalk = graft.ops.RandomWalks.walksAdj(seeds, adj, steps = 3)
      .as[(Long, Long, Long)].collect().toSet
    sys.props("graft.khop.prune") = "dpp"
    try {
      val gotHop = Traverse.kHopIdsAdj(adj, QueriesGraph.custSeed, 2)
        .as[Long].collect().toSet
      val gotWalk = graft.ops.RandomWalks.walksAdj(seeds, adj, steps = 3)
        .as[(Long, Long, Long)].collect().toSet
      assert(gotHop == refHop)
      assert(gotWalk == refWalk)
    } finally sys.props.remove("graft.khop.prune")
    val bad = intercept[IllegalArgumentException] {
      sys.props("graft.khop.prune") = "magic"
      try Traverse.prunedHopForm
      finally sys.props.remove("graft.khop.prune")
    }
    assert(bad.getMessage.contains("GRAFT_KHOP_PRUNE"))
  }

  test("adamic-adar weight table: exact fixed-point of 1e9/ln(df), decreasing") {
    val w = QueriesGraph.aaWeights
    assert(w.length == QueriesGraph.CommonNeighborMaxDf - 1)
    assert(w.head == math.round(1e9 / math.log(2.0)))
    assert(w.last == math.round(1e9 / math.log(QueriesGraph.CommonNeighborMaxDf.toDouble)))
    // strictly decreasing across the whole capped-degree domain — a
    // regression here (overflow, off-by-one indexing) would silently
    // reweight the oracle-matched sums
    assert(w.sliding(2).forall { case Seq(x, y) => x > y })
    assert(w.forall(x => x > 0L && x <= math.round(1e9 / math.log(2.0))))
  }

  test("graph_adamic_adar runs on the sf0.001 fixture with ranked output") {
    val sf001 = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf001)),
      "testdata sf0.001 not present")
    val rows = Queries.all("graph_adamic_adar").fn(spark, sf001)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // ranked by the exact integer units, display double consistent
    assert(rows.map(_._3).toSeq.sliding(2).forall { case Seq(x, y) => x >= y })
    assert(rows.forall { case (_, _, u, aa) =>
      math.abs(aa - math.rint(u / 1e9 * 1e6) / 1e6) < 1e-9 })
  }

  test("Bench warm failure surfaces by name and never enters cache_builds") {
    val builds = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    Bench.warmStepInto(builds, failed, "ok")(())
    Bench.warmStepInto(builds, failed, "boom")(sys.error("synthetic"))
    assert(failed == Seq("boom"))
    assert(builds.keySet == Set("ok"))
    // the map stays summable: no -1.0 sentinel subtracting fake credit
    assert(builds.values.forall(_ >= 0.0))
  }
}
