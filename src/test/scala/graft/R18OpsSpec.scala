package graft

import org.apache.spark.sql.functions._
import graft.ops.Traverse
import graft.ops.Traverse.{BucketSlice, SubSlice}

/** Round-18 contracts: the skew-safe chunked frontier fallback (VERDICT
  * r17 #1 — measured slice sizes, first-fit packing, oversize-bucket
  * re-split, Bloom refusal escape), containment gate v3 (ADVICE r17
  * medium: no bytes-derived proxy ever decides; VERDICT r17 #3: the
  * threaded footer count makes the default path job-free at
  * construction), and the over-limit walks step join that r17's scaladoc
  * promised but never had (VERDICT r17 #5).
  */
class R18OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- chunked fallback: packSlices invariants ------------------------

  test("packSlices: slices never exceed the limit, rows conserved, " +
      "oversize bucket re-splits into its own sub-slices") {
    // adversarially skewed occupancy: bucket 0 carries 315 of 380 rows
    val counts = Seq(
      ((0, 0), 90L), ((0, 1), 85L), ((0, 2), 80L), ((0, 3), 60L),
      ((1, 0), 30L), ((2, 1), 25L), ((3, 2), 10L))
    val limit = 100L
    val slices = Traverse.packSlices(counts, limit, subFan = 4).get
    assert(slices.forall(_.rows <= limit),
      s"a measured slice exceeded the limit: $slices")
    assert(slices.map(_.rows).sum == counts.map(_._2).sum)
    // the oversize bucket's sub-slices contain that bucket alone, and its
    // sub-cells partition across them (each read of directory 0 is a
    // distinct cell set — no cell joined twice)
    val subs = slices.collect { case s: SubSlice => s }
    assert(subs.nonEmpty && subs.forall(_.bucket == 0))
    assert(subs.flatMap(_.cells).sorted == Seq(0, 1, 2, 3))
    // atomic buckets appear in exactly one bucket slice — their
    // directories are read once across the whole hop
    val atomics = slices.collect { case BucketSlice(bks, _) => bks }.flatten
    assert(atomics.sorted == Seq(1, 2, 3))
  }

  test("packSlices: a single cell past the limit refuses (Bloom escape), " +
      "and an exactly-at-limit bucket stays atomic") {
    assert(Traverse.packSlices(Seq(((0, 0), 101L)), 100L, 4).isEmpty)
    val atLimit = Traverse.packSlices(Seq(((5, 0), 100L)), 100L, 4).get
    assert(atLimit == Seq(BucketSlice(Seq(5), 100L)))
  }

  test("subSplitFan: targets ~limit/4 cells on a fully skewed frontier, capped") {
    assert(Traverse.subSplitFan(100L, 25L) == 17)
    assert(Traverse.subSplitFan(26L, 25L) == 5)
    assert(Traverse.subSplitFan(1L << 40, 1L) == 1024)
  }

  test("chunked fallback under adversarial bucket skew: rows identical to " +
      "the live-view reference") {
    import graft.model.DerivedGraph
    // every interior id ≡ 0 (mod 4): the whole over-limit frontier lands
    // in ONE bucket, the uniform-occupancy failure shape ADVICE r17
    // flagged — the measured sub-split (or its Bloom refusal escape) must
    // still visit exactly the reference id set
    val edges = Seq((4L, 8L), (4L, 12L), (4L, 16L), (4L, 20L), (4L, 24L),
      (8L, 28L), (12L, 32L), (16L, 36L), (20L, 3L))
      .map { case (a, b) => (a, b, "e") }.toDF("src", "dst", "label")
    val und = DerivedGraph.undirected(edges)
      .withColumn("bk", pmod(col("a"), lit(4L)).cast("int"))
    val adj = DerivedGraph.Adj(und, und, 4)
    val ref = Traverse.kHopIds(edges, 4L, 2).as[Long].collect().toSet
    val got = Traverse.kHopIdsAdj(adj, 4L, 2, broadcastLimit = 2L)
      .as[Long].collect().toSet
    assert(got == ref && ref.contains(36L))
  }

  // ---- containment gate v3 -------------------------------------------

  private def mkDocs = {
    val prefix = ('a' to 'z').mkString * 4
    val big = prefix + ("0123456789" * 30)
    val mid = ("qrstuvwxyz" * 12) + prefix.take(100)
    Seq((0L, prefix), (1L, big), (2L, mid), (3L, "zyxw" * 30))
      .toDF("doc_id", "text")
  }

  /** Job-group names observed on the shared listener bus, with a flush
    * job to order against: the bus is FIFO, so once the flush group is
    * visible any earlier job would be too.
    */
  private def jobGroupsDuring(constructGroup: String)(body: => Unit): Seq[String] = {
    @volatile var groups = Vector.empty[String]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        groups :+= Option(js.properties.getProperty("spark.jobGroup.id"))
          .getOrElse("")
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(constructGroup, constructGroup)
      body
      spark.sparkContext.setJobGroup(s"$constructGroup-flush", "flush")
      spark.range(1).count()
      val deadline = System.nanoTime + 10000000000L
      while (!groups.contains(s"$constructGroup-flush") &&
          System.nanoTime < deadline)
        Thread.sleep(20)
      assert(groups.contains(s"$constructGroup-flush"),
        "flush job never reached the listener bus")
      groups
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      spark.sparkContext.clearJobGroup()
    }
  }

  test("containment gate v3: a threaded doc count decides with NO Spark job " +
      "at construction, and keeps the hint") {
    val docs = mkDocs
    var out: org.apache.spark.sql.DataFrame = null
    val groups = jobGroupsDuring("r18-gate-construct") {
      out = graft.ops.llm.Dedup.containment(docs, docRowCount = 4L)
    }
    assert(!groups.contains("r18-gate-construct"),
      s"gate construction ran Spark jobs: $groups")
    out.collect()
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: flatten(q.plan)
        case n => Seq(n)
      }
    assert(flatten(out.queryExecution.executedPlan).exists(_.isInstanceOf[
        org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]))
  }

  test("containment gate v3: a threaded count past the bound takes the " +
      "shuffle side with identical values") {
    val docs = mkDocs
    val expect = graft.ops.llm.Dedup.containment(docs, docRowCount = 4L)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(expect.nonEmpty)
    val got = graft.ops.llm.Dedup.containment(docs,
        broadcastDocLimit = 3L, docRowCount = 4L)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(got == expect)
  }

  test("Tables.rowCount: the footer sum equals the scan count") {
    val sf = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf)),
      "testdata sf0.001 not present")
    for (t <- Seq("documents", "lineitem", "events"))
      assert(graft.model.Tables.rowCount(spark, sf, t) ==
        graft.model.Tables(spark, sf, t).count(), s"table $t")
  }

  test("dedup_containment constructs with NO Spark job on the default path") {
    val sf = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf)),
      "testdata sf0.001 not present")
    val groups = jobGroupsDuring("r18-qd-construct") {
      Queries.all("dedup_containment").fn(spark, sf)
    }
    assert(!groups.contains("r18-qd-construct"),
      s"dedup_containment construction ran Spark jobs: $groups")
  }

  // ---- stress riding the shared BFS levels (VERDICT r17 #2) ----------

  test("stressCentralityDF with precomputed levels is row-identical to the " +
      "standalone form (diamond + tail)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val und = (edges ++ edges.map(e => (e._2, e._1))).toDF("a", "b")
    val ref = graft.ops.GraphAnalytics
      .stressCentralityDF(und, Seq(1L, 5L), 10)
      .as[(Long, Long)].collect().toSeq
    // the landmark-BFS frame the shared traversal would produce, by hand
    val levels = Seq(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 2L), (1L, 5L, 3L),
      (5L, 5L, 0L), (5L, 4L, 1L), (5L, 2L, 2L), (5L, 3L, 2L), (5L, 1L, 3L))
      .toDF("lm", "id", "dist")
    val got = graft.ops.GraphAnalytics
      .stressCentralityDF(und, Seq(1L, 5L), 10, levels = Some(levels))
      .as[(Long, Long)].collect().toSeq
    assert(got == ref)
  }

  test("graph_stress (shared-BFS wiring) matches the standalone form at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    assume(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(sf)),
      "testdata sf0.001 not present")
    import graft.model.DerivedGraph
    val ref = graft.ops.GraphAnalytics.stressCentralityDF(
        DerivedGraph.undirected(DerivedGraph(spark, sf).edges),
        QueriesGraphX.spLandmarks, 10)
      .as[(Long, Long)].collect().toSeq
    val got = Queries.all("graph_stress").fn(spark, sf)
      .as[(Long, Long)].collect().toSeq
    assert(got == ref)
  }

  // ---- over-limit walks step (VERDICT r17 #5) ------------------------

  test("walks step past the broadcast limit: the hint drops and the step " +
      "shuffles both sides on the node key") {
    val und = (1L to 200L).map(i => (i, i + 1)).toDF("a", "b")
    val frontier = (1L to 10L).map(i => (i, i * 3)).toDF("walk_id", "node")
      .localCheckpoint()
    // disable static+adaptive auto-broadcast so the executed plan shows
    // the UNHINTED choice a 10^9-walk frontier would get, not AQE's
    // re-promotion of the tiny test fixture
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val over = graft.ops.RandomWalks.stepCandidates(frontier, und, None,
        walkCount = 10L, step = 1, broadcastLimit = 9L)
      over.collect()
      val p = over.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastHashJoin"),
        s"over-limit step still broadcast the frontier:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"expected a shuffle join on the node key:\n$p")
      // and the same fixture UNDER the limit broadcasts (the gate, not
      // the thresholds, decides)
      val underL = graft.ops.RandomWalks.stepCandidates(frontier, und, None,
        walkCount = 10L, step = 1, broadcastLimit = 10L)
      underL.collect()
      assert(underL.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"))
      // rows identical either way
      assert(over.collect().toSet == underL.collect().toSet)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
