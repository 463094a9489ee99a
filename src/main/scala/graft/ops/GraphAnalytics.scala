package graft.ops

import org.apache.spark.graphx.{Edge, Graph, PartitionStrategy, VertexId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.reflect.ClassTag

/** Graph analytics via GraphX (BASELINE.json "spark_approach": GraphX for
  * graph analytics). Graphs are materialized on demand from the vertex/edge
  * DataFrames (SURVEY.md §1.2), edge-partitioned with EdgePartition2D in
  * [[toGraphX]] so both endpoints of any edge land in at most 2√P
  * partitions, bounding vertex replication for every algorithm run on the
  * graph — and memoized per (session, sfDir) in [[derivedGraphX]] so the
  * iterative algorithms in one Verify/Bench run share a single cached
  * build instead of re-deserializing the DataFrames per query.
  *
  * Triangle counting runs as a degree-ordered DataFrame join
  * ([[triangleCountDF]]) rather than GraphX's `TriangleCount`: the GraphX
  * implementation materializes per-vertex neighbor hash sets (memory ∝ Σdeg²
  * on hubs), while the oriented wedge join keeps everything in Tungsten
  * rows with AQE handling skew — the shape that survives a 100× scale-up.
  * The GraphX variant is kept ([[triangleCount]]) and cross-checked in
  * GraphAnalyticsSpec.
  */
object GraphAnalytics {

  /** Largest peel fringe (rows) [[kTrussDF]] will broadcast to the three
    * per-round triangle-kill joins. ~500k (a,b) long pairs ≈ 25 MB packed
    * — comfortably inside a 1 GiB-driver budget; a larger fringe (a mass
    * first-round peel on a sparse graph) falls back to AQE's shuffle
    * join, which at that size is the right plan anyway.
    */
  final val MaxBroadcastFringe = 500000L

  /** Fringe size below which a k-truss peel round ALWAYS skips bulk-frame
    * materialization and runs as lazy broadcast-probe chains (see the
    * round body in [[kTrussDF]]). The effective lazy gate is RELATIVE —
    * `max(MaxLazyFringe, |E|/20)` — because an absolute cut reclassifies
    * rounds as the graph scales: at sf10 (120M canonical edges, 110M
    * triangles) rounds removing 168k/66k edges fell off a 20k gate and
    * each paid a |T|-row checkpoint write, turning the measured decade
    * ratio from ~10x into 14.7x. Relative to |E| the same rounds are the
    * same tail on every decade.
    */
  final val MaxLazyFringe = 20000L

  /** Ceiling (rows) on the CUMULATIVE lazy-tail broadcast state in
    * [[kTrussDF]] — both the folded removed-edge set and the folded
    * support-charge table are re-broadcast every lazy round, so a long
    * mid-size tail must eventually re-base to fresh checkpoints instead
    * of growing the broadcasts without bound. 2M (a,b[,dec]) rows ≈
    * 50 MB — an intentional factor above [[MaxBroadcastFringe]] since
    * these accumulate across rounds.
    */
  final val MaxCumLazyRows = 2000000L

  /** Build a GraphX graph with (label, name) vertex attributes,
    * EdgePartition2D-partitioned.
    *
    * Edge partitions are sized down from the SQL shuffle width: iterative
    * Pregel jobs pay per-task overhead every superstep, so GraphX wants
    * fewer, fatter partitions than a one-shot SQL shuffle (rule of thumb
    * ~1M+ edges per partition; cores/4 here keeps all executors busy while
    * cutting superstep task counts 4×). At cluster scale the same ratio
    * holds relative to total parallelism.
    */
  /** GraphX RDD partition count for an |E|-row edge set: cores/4 is the
    * FLOOR (fat partitions cut superstep task overhead on small graphs),
    * but it must not CAP big ones — pinned at 8, sf10's 120M edges meant
    * 15M deserialized Edge objects per partition and 8-way supersteps on
    * 32 cores (graph_cc read 14.7× per 10× data in the r13 tier-5 probe).
    * Scale by the ~2M-edges/partition rule, bounded at 4× parallelism so
    * superstep task counts stay iteration-friendly.
    */
  private def graphParts(sc: org.apache.spark.SparkContext, nE: Long): Int =
    math.max(math.max(2, sc.defaultParallelism / 4),
      math.min(sc.defaultParallelism * 4, (nE / 2000000L).toInt + 1))

  /** Resize an RDD to the [[graphParts]] target in the right direction:
    * `coalesce` can only REDUCE a partition count, so a source that
    * arrives NARROWER than the edge-scaled target (an AQE-coalesced or
    * persisted frame) must go through a shuffle repartition or the sf10
    * partition-starvation fix silently does not apply (ADVICE r13).
    */
  private def toParts[T: ClassTag](rdd: org.apache.spark.rdd.RDD[T],
      parts: Int): org.apache.spark.rdd.RDD[T] =
    if (parts > rdd.getNumPartitions) rdd.repartition(parts)
    else rdd.coalesce(parts)

  def toGraphX(vertices: DataFrame, edges: DataFrame): Graph[(String, String), String] = {
    val sc = vertices.sparkSession.sparkContext
    val parts = graphParts(sc, edges.count())
    val vRDD = toParts(vertices.select("id", "label", "name").rdd
      .map(r => (r.getLong(0): VertexId, (r.getString(1), r.getString(2)))), parts)
    val eRDD = toParts(edges.select("src", "dst", "label").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), r.getString(2))), parts)
    Graph(vRDD, eRDD).partitionBy(PartitionStrategy.EdgePartition2D)
  }

  // session-scoped like DerivedGraph's memo (identity-keyed, strong refs —
  // pinned until SessionCache.evict): one cached GraphX build serves
  // pagerank + cc + bfs in a single Verify/Bench session.
  private val gxCache =
    new graft.model.SessionCache[String, Graph[(String, String), String]]

  /** Materialize the session-shared graph caches — DerivedGraph warms its
    * own persisted DataFrames (the persist lives there), this module warms
    * the GraphX build it caches.
    */
  def warm(spark: SparkSession, sfDir: String): Unit = {
    graft.model.DerivedGraph.warm(spark, sfDir)
    val gx = derivedGraphX(spark, sfDir)
    gx.vertices.count(); gx.edges.count()
  }

  /** The derived property graph as a cached GraphX graph. */
  def derivedGraphX(spark: SparkSession, sfDir: String): Graph[(String, String), String] =
    gxCache.getOrElseUpdate(spark, sfDir)({
      val g = graft.model.DerivedGraph(spark, sfDir)
      val gx = toGraphX(g.vertices, g.edges)
      gx.cache()
      gx
    })

  /** PageRank (fixed iteration count → deterministic superstep structure). */
  def pageRank[VD: ClassTag, ED: ClassTag](g: Graph[VD, ED], numIter: Int): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    g.staticPageRank(numIter).vertices.toDF("id", "rank")
  }

  def pageRank(vertices: DataFrame, edges: DataFrame, numIter: Int = 10): DataFrame =
    pageRank(toGraphX(vertices, edges), numIter)

  /** Static PageRank as chained DataFrame joins, with GraphX
    * `staticPageRank` semantics (init 1.0, directed src→dst messages,
    * `rank' = 0.15 + 0.85·Σ rank/outdeg`, final Σranks normalized to |V|
    * like SPARK-18847's sink correction) — but DETERMINISTIC and
    * oracle-replayable:
    *  - per-destination message sums accumulate as FIXED-POINT LONGS
    *    (floor of 1e9× the per-edge contribution; see the loop comment) →
    *    order/partitioning-independent, unlike GraphX's double `merge`;
    *  - ranks are rounded to `roundScale` decimals after EVERY iteration,
    *    so an external replay (the DuckDB chained-CTE oracle) that applies
    *    the identical rounding ladder reproduces the exact values —
    *    IEEE division/multiply/add of identical doubles is engine-invariant,
    *    and the per-iteration round quashes any residual ULP drift before
    *    it can compound.
    * Cross-checked against GraphX `staticPageRank` (tolerance-based) in
    * GraphAnalyticsSpec.
    *
    * Scale shape: the static (src, dst, outdeg) edge relation materializes
    * ONCE (localCheckpoint — the same lineage-bounding pattern as the
    * k-hop frontier and clustersDF loops; a GraphX Pregel run persists its
    * edge RDD per superstep the same way), and the tiny |V|-row rank
    * table checkpoints every `checkpointEvery` rounds (default 2 — see
    * the in-loop comment for the cadence measurement). Without periodic
    * cuts the 10 rounds stack into one ~40-join nested plan whose
    * Catalyst/AQE optimization time DWARFS the data work (measured 38 s
    * vs 2 s on the sf0.1 derived graph — planning, not execution); with
    * them, each round is a flat join+agg over |V| rows (AQE broadcasts
    * ranks against the edge table when small) and the per-round shuffle
    * carries (dst, decimal) message rows only.
    */
  def pageRankDF(vertices: DataFrame, edges: DataFrame, numIter: Int = 10,
      roundScale: Int = 6, checkpointEvery: Int = 2,
      broadcastRankLimit: Long = 5000000L): DataFrame = {
    val e = edges.select("src", "dst")
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("__outdeg")), "src")
      .localCheckpoint()
    // checkpointed frames are LogicalRDDs with UNKNOWN stats — the planner
    // would sort-merge the big edge relation against the |V|-row rank
    // table EVERY round (measured ~1 s/round on the sf0.1 graph, ~90% of
    // the query). The rank/message tables are |V| rows; while that is
    // broadcast-sized, hint it explicitly — past the limit the rounds
    // degrade to the 3-shuffle-per-iteration plan that scales arbitrarily
    // (same adaptive-hint policy as Traverse.broadcastRowLimit).
    val nV = vertices.count()
    // Overflow guard for the fixed-point LONG message sum below: the units
    // flowing into ONE vertex are bounded by 1e9·Σranks ≈ 1e9·|V| (ranks
    // sum to ~|V| every round), so |V| < 2⁶³/1e9 makes wraparound
    // impossible. Fail loudly past that instead of returning silently
    // wrong ranks in non-ANSI mode (same policy as Dedup.clustersDF).
    require(nV < Long.MaxValue / 1000000000L,
      s"pageRankDF: |V|=$nV exceeds the 1e9 fixed-point headroom " +
        "(long message sums could overflow); reduce the scale factor")
    val hintSmall: DataFrame => DataFrame =
      if (nV <= broadcastRankLimit) broadcast(_) else identity
    // Vertices with NO in-edges never receive a message: their rank is
    // 1.0 at init and exactly round(0.15 + 0.85·0) = 0.15 from round 1 on
    // — a STATIC row set, computed once. The per-round rank table is then
    // (ranked message receivers) ∪ (this constant frame): a zero-shuffle
    // union instead of a per-round |V|-row outer join.
    val noIn = vertices.select("id")
      .join(ed.select(col("dst")), col("id") === col("dst"), "left_anti")
      .localCheckpoint()
    // Message accumulation is FIXED-POINT LONG arithmetic, not DECIMAL:
    // floor((rank/outdeg)·1e9) per edge, exact long sum, one double
    // divide per receiver. Same order-independence guarantee (integer
    // addition commutes), identical IEEE ops in the DuckDB replay — but
    // all codegen primitives. The earlier DECIMAL cast allocated a
    // BigDecimal PER EDGE PER ROUND (~3 s of executor CPU per round on
    // the sf0.1 graph — the whole-query hotspot). Headroom: 2⁶³/1e9 ≈
    // 9.2e9 rank units flowing into one vertex before overflow —
    // raise the scale denominator before graphs get near that.
    def rankOf(msum: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      round(lit(0.15) + lit(0.85) * msum, roundScale)
    var ranks = vertices.select(col("id"), lit(1.0).as("rank"))
    for (i <- 1 to numIter) {
      val msum = hintSmall(ranks).join(ed, col("id") === col("src"))
        .select(col("dst"),
          floor(col("rank") / col("__outdeg") * lit(1e9)).as("__c"))
        .groupBy("dst")
        .agg((sum(col("__c")).cast("double") / lit(1e9)).as("__msum"))
      // no-in vertices: round(0.15 + 0.85·0, s) = 0.15 exactly for any s≥2
      ranks = msum.select(col("dst").as("id"), rankOf(col("__msum")).as("rank"))
        .unionAll(noIn.select(col("id"), lit(0.15).as("rank")))
      // cut lineage every TWO rounds (default): each materialization+
      // convergence job costs fixed driver latency, and two stacked rounds
      // per cut measured ~25% faster than one (3.5–5.1 s vs 4.7–8.0 s on
      // the sf0.1 graph) while five rounds per cut regressed again (plan
      // growth). The un-cut round's chain re-executes once inside the next
      // broadcast build — cheaper than the extra job round-trip at this
      // |V|; past broadcast sizes the hint drops and per-round cuts win
      // back (pass checkpointEvery = 1). The cut itself materializes only
      // the |V|-row rank table.
      // eager (default) on purpose: folding the materialization into the
      // next round's broadcast-build job (eager=false) measured SLOWER —
      // it serializes the cut into the broadcast thread instead of a
      // parallel dedicated job.
      if (i % checkpointEvery == 0 || i == numIter) ranks = ranks.localCheckpoint()
    }
    // normalize Σranks to |V| like GraphX (SPARK-18847 sink correction):
    // the total is a single-row exact-decimal aggregate over the final
    // (checkpointed) rank table, fetched as ONE driver row and embedded
    // as literals — the renormStep discipline: broadcast(tot) collects
    // the same row to the driver anyway, then pays a broadcast-build job
    // and an extra plan layer on top. Types match the former crossJoin
    // form exactly (t is dsum's DOUBLE, n a LONG), so
    // `rank * n / t` promotes identically and the DuckDB replay is
    // unchanged; the scaling step is IEEE mult/div of identical doubles
    // on both engines.
    if (sys.props.get("graft.pr.crossjoin")
        .orElse(sys.env.get("GRAFT_PR_CROSSJOIN")).contains("1")) {
      // pre-r19 form, kept for the CentralityAB tool only
      val tot = ranks.agg(graft.Qh.dsum(col("rank"), 6).as("__t"),
        count(lit(1)).as("__n"))
      ranks.crossJoin(broadcast(tot))
        .select(col("id"),
          round(col("rank") * col("__n") / col("__t"), roundScale).as("rank"))
    } else {
      val trow = ranks.agg(graft.Qh.dsum(col("rank"), 6).as("__t"),
        count(lit(1)).as("__n")).head()
      val (t, n) = (trow.getDouble(0), trow.getLong(1))
      ranks.select(col("id"),
        round(col("rank") * lit(n) / lit(t), roundScale).as("rank"))
    }
  }

  /** Personalized PageRank (Page et al. 1999 §6 / Jeh & Widom 2003):
    * [[pageRankDF]]'s ladder with the teleport mass concentrated on a
    * SEED SET instead of spread uniformly — rank(v) = round(base(v) +
    * 0.85·msum(v), 6) per round, where base(v) = 0.15·|V|/|S| for seeds
    * and 0 elsewhere (total teleport mass 0.15·|V|, matching the
    * unnormalized pagerank convention so the two ladders share the
    * fixed-point headroom analysis). The recommendation/proximity
    * primitive: ranks measure closeness to the seeds, not global
    * prestige.
    *
    * Same determinism ladder as [[pageRankDF]] (1e9 fixed-point long
    * message sums, per-round rounding), same per-round shape (receivers ∪
    * constant no-in frame — no-in vertices hold base(v) exactly from
    * round 1), same lineage-cut cadence. The seed-flag join rides a
    * broadcast of the seed id list only.
    */
  def personalizedPageRankDF(vertices: DataFrame, edges: DataFrame,
      seedPred: org.apache.spark.sql.Column, numIter: Int = 10,
      roundScale: Int = 6, checkpointEvery: Int = 2,
      broadcastRankLimit: Long = 5000000L): DataFrame = {
    val e = edges.select("src", "dst")
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("__outdeg")), "src")
      .localCheckpoint()
    val nV = vertices.count()
    require(nV < Long.MaxValue / 1000000000L,
      s"personalizedPageRankDF: |V|=$nV exceeds the 1e9 fixed-point headroom")
    val seeds = vertices.filter(seedPred).select(col("id")).localCheckpoint()
    val nS = seeds.count()
    require(nS > 0, "personalizedPageRankDF: empty seed set")
    // both engines compute the seed base as (0.15 · nV) / nS in this op
    // order — see the generated oracle
    val seedBase = lit(0.15) * lit(nV.toDouble) / lit(nS.toDouble)
    val hintSmall: DataFrame => DataFrame =
      if (nV <= broadcastRankLimit) broadcast(_) else identity
    val seedFlag = broadcast(seeds.withColumn("__s", lit(1)))
    // no-in vertices never receive a message: constant base(v) from
    // round 1 (0.15·|V|/|S| for seeds, exactly 0.0 otherwise)
    val noIn = vertices.select("id")
      .join(ed.select(col("dst")), col("id") === col("dst"), "left_anti")
      .join(seedFlag, Seq("id"), "left")
      .select(col("id"),
        when(col("__s").isNotNull, round(seedBase, roundScale))
          .otherwise(lit(0.0)).as("rank"))
      .localCheckpoint()
    var ranks = vertices.select(col("id"), lit(1.0).as("rank"))
    for (i <- 1 to numIter) {
      val msum = hintSmall(ranks).join(ed, col("id") === col("src"))
        .select(col("dst"),
          floor(col("rank") / col("__outdeg") * lit(1e9)).as("__c"))
        .groupBy("dst")
        .agg((sum(col("__c")).cast("double") / lit(1e9)).as("__msum"))
      ranks = msum
        .join(seedFlag, msum("dst") === seedFlag("id"), "left")
        .select(msum("dst").as("id"),
          round(when(col("__s").isNotNull, seedBase).otherwise(lit(0.0)) +
            lit(0.85) * col("__msum"), roundScale).as("rank"))
        .unionAll(noIn)
      if (i % checkpointEvery == 0 || i == numIter) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Eigenvector centrality by synchronous power iteration (Bonacich
    * 1972): x' = A'x, L1-renormalized to Σx = |V| every round so the
    * iterate neither diverges nor vanishes (the renormalization is what
    * makes this value-checkable where Katz/eigenvector in raw form is
    * not: unnormalized iterates grow like (λ₁)^k and overflow any fixed
    * precision, while the normalized ladder stays O(|V|) forever).
    *
    * Determinism ladder, same as [[pageRankDF]] but with 1e6 fixed-point
    * units (messages are NOT divided by degree here, so per-vertex unit
    * inflow is bounded by 1e6·Σx = 1e6·|V| — the coarser scale buys 1000×
    * headroom): per round, floor(x·1e6) exact-long sums into each dst,
    * one IEEE divide back to double, then the per-round total as an exact
    * DECIMAL sum and x' = round(y·n/t, 6) — identical op order in the
    * DuckDB replay.
    *
    * Scale shape: identical to pageRankDF — static edge relation
    * checkpointed once, |V|-row iterate joined per round (broadcast-
    * hinted under the limit), per-round shuffle carries (dst, long) rows,
    * plus one scalar-total broadcast per round (the pageRankDF
    * final-normalize shape, just per-round).
    *
    * Unlike pageRankDF the lineage cut lands on the MESSAGE table `y`
    * (pre-renormalization), not the iterate `x`, and every round. The
    * per-round total makes y a double-consumer frame (`tot`'s aggregate
    * AND `x`'s projection both read it), and an un-cut round re-executes
    * its edge join once more inside the next round's broadcast build — the
    * r9 shape paid both costs (measured 3-4× pageRankDF on the same
    * ladder; 17.4 → 6.3 s aged on the sf0.1 graph from this change
    * alone). With y materialized, `tot` is a tiny agg over a LogicalRDD
    * and `x` a lazy zero-shuffle projection — numerically IDENTICAL
    * ladder, so the DuckDB replay (QueriesGraphX.evOracleSql) is
    * untouched. `checkpointEvery` is kept for signature stability but the
    * cut cadence is structurally 1 (every round cuts at y).
    */
  def eigenvectorDF(vertices: DataFrame, edges: DataFrame, numIter: Int = 8,
      roundScale: Int = 6, checkpointEvery: Int = 2,
      broadcastRankLimit: Long = 5000000L): DataFrame = {
    // Right-size the static edge relation ONCE: the undirected view
    // arrives as a union of narrow scan/shuffle outputs (134 partitions of
    // ~18k rows at sf0.1 — vs pageRankDF's 8, whose ed passes through an
    // AQE-coalesced shuffle join), and every one of the 8 rounds re-pays
    // that width as join-stage tasks. Coalescing the checkpointed RDD is a
    // narrow wrapper (no recompute, no shuffle); target ~4M edge
    // rows/partition, floored at the session's parallelism so the
    // per-round join stays fully parallel at any scale.
    val ed = rightSizeEdges(edges)
    val nV = vertices.count()
    // unit inflow into one vertex ≤ 1e6·Σx = 1e6·|V| (Σx renormalizes to
    // |V| each round) — same loud-failure policy as pageRankDF
    require(nV < Long.MaxValue / 1000000L,
      s"eigenvectorDF: |V|=$nV exceeds the 1e6 fixed-point headroom")
    val hintSmall: DataFrame => DataFrame =
      if (nV <= broadcastRankLimit) broadcast(_) else identity
    val yParts = iterateWidth(vertices, nV)
    val noIn = vertices.select("id")
      .join(ed.select(col("dst")), col("id") === col("dst"), "left_anti")
      .localCheckpoint()
    var x = vertices.select(col("id"), lit(1.0).as("x"))
    for (i <- 1 to numIter)
      x = renormStep(x, "x", ed, "src", "dst", noIn,
        hintSmall, yParts, roundScale, "x")
    x
  }

  /** Right-size a static edge relation at checkpoint: an undirected view
    * arrives as a union of narrow scan/shuffle outputs (134 partitions of
    * ~18k rows at sf0.1 — vs pageRankDF's 8, whose ed passes through an
    * AQE-coalesced shuffle join), and every iteration round re-pays that
    * width as join-stage tasks. Coalescing the checkpointed RDD is a
    * narrow wrapper (no recompute, no shuffle); target ~4M edge
    * rows/partition, floored at the session's parallelism so the
    * per-round join stays fully parallel at any scale.
    */
  private def rightSizeEdges(edges: DataFrame): DataFrame = {
    val edRaw = edges.select("src", "dst").localCheckpoint()
    val edTarget = math.max(
      edRaw.sparkSession.sparkContext.defaultParallelism.toLong,
      edRaw.count() / 4000000L + 1L).toInt
    if (edRaw.rdd.getNumPartitions > edTarget) edRaw.coalesce(edTarget)
    else edRaw
  }

  /** Partition width of a per-round |V|-row iterate, sized to the DATA:
    * ~2M rows per partition, capped by the session's parallelism at
    * scale, floored at 8 (a width of 1 serializes the agg reduce — the
    * BENCHNOTES r10 variant ladder). The expensive per-round work (the
    * edge join) keeps the edge relation's width — this only narrows the
    * materialized message table. AQE right-sizes shuffle partitions
    * inside a stage, but a checkpointed RDD keeps its static width, and
    * 8 rounds × 32 near-empty partitions × (materialize + total +
    * broadcast-build) jobs measured 10.2 s aged vs 3.8 s at a data-sized
    * width on the sf0.1 graph — pure per-task overhead, not plan cost.
    */
  private def iterateWidth(vertices: DataFrame, nV: Long): Int =
    math.max(8L, math.min(
      vertices.sparkSession.sparkContext.defaultParallelism.toLong,
      nV / 2000000L + 1L)).toInt

  /** One L1-renormalized fixed-point message round — the shared ladder
    * step of [[eigenvectorDF]] and [[hitsDF]]. Gather: each edge sends
    * floor(state·1e6) units from its `sendKey` endpoint to its
    * `gatherKey` endpoint; exact LONG sums per receiver, one IEEE divide
    * back to double, receivers ∪ `noRecv` (constant-0 frame) = all |V|
    * rows. Renormalize: Σ to |V| via the exact-DECIMAL total fetched as
    * ONE driver row and embedded as literals — `broadcast(tot)` would
    * collect the same row to the driver anyway (that's how broadcast
    * exchanges build), but the crossJoin form pays a broadcast-build job
    * + an extra plan layer per round. Types match the crossJoin form
    * exactly: t is dsum's DOUBLE, n a LONG, so `__y * n / t` promotes
    * identically and the DuckDB replays are unchanged. The lineage cut
    * lands on the message table `y` because BOTH the total and the
    * renormalized projection read it (an un-cut y re-executes its edge
    * join inside the next round's broadcast build — the r9 3-4× cost).
    */
  /** When true (default), each renorm round's message table materializes
    * INSIDE the scalar-total job instead of a dedicated eager-checkpoint
    * job: `localCheckpoint(eager = false)` cuts lineage identically (the
    * returned frame is a LogicalRDD either way, its RDD marked for local
    * checkpointing at call time), and the total's `head()` is a blocking
    * global aggregate touching every partition — so that one job both
    * fills the checkpoint and fetches the scalar. One job per renorm
    * round instead of two (measured per-round jobs and wall in the
    * CentralityAB entry, BENCHNOTES r19 — VERDICT r18 #5). Unlike
    * pageRankDF's REJECTED eager=false (there the fill folded into the
    * next round's broadcast-build THREAD, serializing it), here the
    * scalar fetch is an immediate same-frame action, so the fill rides a
    * normal fully-parallel job. Sys-prop switch for the A/B tool only.
    */
  private[graft] def renormFoldedFetch: Boolean =
    !sys.props.get("graft.renorm.eager")
      .orElse(sys.env.get("GRAFT_RENORM_EAGER")).contains("1")

  private def renormStep(state: DataFrame, stateCol: String, ed: DataFrame,
      sendKey: String, gatherKey: String, noRecv: DataFrame,
      hintSmall: DataFrame => DataFrame, yParts: Int, roundScale: Int,
      outCol: String): DataFrame = {
    val y = hintSmall(state).join(ed, col("id") === col(sendKey))
      .select(col(gatherKey), floor(col(stateCol) * lit(1e6)).as("__c"))
      .groupBy(gatherKey)
      .agg((sum(col("__c")).cast("double") / lit(1e6)).as("__y"))
      .select(col(gatherKey).as("id"), col("__y"))
      .unionAll(noRecv.select(col("id"), lit(0.0).as("__y")))
      .coalesce(yParts)
      .localCheckpoint(eager = !renormFoldedFetch)
    val row = y.agg(graft.Qh.dsum(col("__y"), roundScale).as("__t"),
      count(lit(1)).as("__n")).head()
    val (t, n) = (row.getDouble(0), row.getLong(1))
    y.select(col("id"),
      round(col("__y") * lit(n) / lit(t), roundScale).as(outCol))
  }

  /** HITS hubs & authorities (Kleinberg 1999) over the DIRECTED graph —
    * the mutually-recursive twin of [[eigenvectorDF]]: per round,
    * auth' = renorm(Aᵀ·hub) then hub' = renorm(A·auth'), each half-step
    * the same L1 ladder (Σ = |V|; Kleinberg's L2 norm would need a
    * cross-engine sqrt-of-sum — L1 keeps the fixed-point units bounded
    * AND the replay exact; the top-k ORDER is what HITS consumers use,
    * and it is norm-invariant). Directed is the point here: unlike
    * eigenvector centrality — degenerate on this layered-DAG derived
    * graph — HITS is DESIGNED for such bipartite-ish link structure
    * (hubs = vertices pointing at strong authorities). Same scale shape
    * as eigenvectorDF: 2·numIter renorm rounds over the once-checkpointed
    * right-sized edge relation.
    */
  def hitsDF(vertices: DataFrame, edges: DataFrame, numIter: Int = 4,
      roundScale: Int = 6, broadcastRankLimit: Long = 5000000L): DataFrame = {
    val ed = rightSizeEdges(edges)
    val nV = vertices.count()
    require(nV < Long.MaxValue / 1000000L,
      s"hitsDF: |V|=$nV exceeds the 1e6 fixed-point headroom")
    val hintSmall: DataFrame => DataFrame =
      if (nV <= broadcastRankLimit) broadcast(_) else identity
    val yParts = iterateWidth(vertices, nV)
    val noIn = vertices.select("id")
      .join(ed.select(col("dst")), col("id") === col("dst"), "left_anti")
      .localCheckpoint()
    val noOut = vertices.select("id")
      .join(ed.select(col("src")), col("id") === col("src"), "left_anti")
      .localCheckpoint()
    var hub = vertices.select(col("id"), lit(1.0).as("hub"))
    var auth = vertices.select(col("id"), lit(0.0).as("auth"))
    for (i <- 1 to numIter) {
      auth = renormStep(hub, "hub", ed, "src", "dst", noIn,
        hintSmall, yParts, roundScale, "auth")
      hub = renormStep(auth, "auth", ed, "dst", "src", noOut,
        hintSmall, yParts, roundScale, "hub")
    }
    // both sides carry all |V| ids; the join is |V|⋈|V| on the id key
    hub.join(auth, "id")
  }

  /** Connected components (undirected semantics — GraphX CC ignores
    * direction).
    */
  def connectedComponents[VD: ClassTag, ED: ClassTag](g: Graph[VD, ED]): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    g.connectedComponents().vertices.toDF("id", "component")
  }

  def connectedComponents(vertices: DataFrame, edges: DataFrame): DataFrame =
    connectedComponents(toGraphX(vertices, edges))

  /** Label propagation (community detection) — GraphX LPA with a fixed
    * superstep count. Tie-breaking inside LPA follows map iteration order,
    * so community IDS are not run-stable — downstream consumers use the
    * per-vertex row set (stable cardinality), never the raw ids; declared
    * rows-only in the oracle contract like the other fixpoint algorithms.
    */
  def labelPropagation[VD: ClassTag, ED: ClassTag](g: Graph[VD, ED], numIter: Int): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    org.apache.spark.graphx.lib.LabelPropagation.run(g, numIter)
      .vertices.toDF("id", "community")
  }

  /** Deterministic synchronous label propagation. Every vertex starts
    * with its own id as its label; each superstep a vertex adopts the
    * most frequent label among its neighbours (undirected view), ties
    * broken by the SMALLEST label; vertices receiving no message keep
    * their label. Unlike GraphX's LPA — whose tie-break follows hash-map
    * iteration order, making community ids run-unstable — this is a pure
    * function of the graph, so the result is value-checkable in SQL
    * (the graph_lpa oracle replays these supersteps as chained CTEs).
    *
    * 100 TB shape: per round, one |2E|⨝|V| join (label side broadcast
    * below the adaptive limit, hash join past it), one map-side-combinable
    * (vertex,label) count, and one argmax agg expressed as
    * `max(struct(count, -label))` — lexicographic struct max picks the
    * max count then the min label with NO per-vertex sort. All shuffles
    * key on vertex id; lineage is cut per round like [[pageRankDF]].
    * All-long arithmetic — no floats anywhere, so no rounding ladder is
    * needed for oracle parity.
    */
  def lpaDF(vertices: DataFrame, edges: DataFrame, numIter: Int = 5,
      broadcastLabelLimit: Long = 5000000L,
      undOverride: Option[DataFrame] = None): DataFrame = {
    val e = edges.select("src", "dst")
    // the materialized 2|E| copy EARNS its write here, unlike kCoreDF's
    // (r13 A/B at sf10: checkpoint aged 19.5 s vs lazy view 47.0 s, cold
    // parity) — numIter rounds each probe und once, so the one-time write
    // amortizes where kcore's 2-round peel could not. `undOverride` lets
    // a caller supply an equivalent materialization-stable (a, b) frame
    // instead — e.g. a cross-session cached parquet copy that keeps the
    // 2|E| rows OUT of the RDD storage region entirely (the sf100
    // pre-emption of the kcore spill mode; A/B'd at sf10 in BENCHNOTES
    // r14). Caller contract: same rows as the union below.
    val und = undOverride.getOrElse(
      e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
        .select(col("src").as("a"), col("dst").as("b"))
        .localCheckpoint())
    val hintSmall: DataFrame => DataFrame =
      if (vertices.count() <= broadcastLabelLimit) broadcast(_) else identity
    var labels = vertices.select(col("id"), col("id").as("lbl"))
    for (i <- 1 to numIter) {
      val pick = und.join(hintSmall(labels), col("b") === col("id"))
        .groupBy(col("a"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("a"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("a").as("id"), (-col("m.nl")).as("newLbl"))
      labels = labels.join(hintSmall(pick), Seq("id"), "left")
        .select(col("id"), coalesce(col("newLbl"), col("lbl")).as("lbl"))
        .localCheckpoint()
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** k-core decomposition by iterative peeling: repeatedly drop vertices
    * with fewer than `k` neighbours among the survivors; the fixpoint is
    * the maximal subgraph of minimum degree ≥ k (Seidman, "Network
    * structure and minimum degree", Social Networks 1983 — the standard
    * graph-density screen). `rounds` bounds the peel supersteps so the
    * computation is replayable as chained SQL rounds; convergence within
    * the bound is PROVEN per graph family in GraphAnalyticsSpec (one extra
    * round must change nothing), not assumed. Returns the core members
    * with their within-core degree.
    *
    * 100 TB shape: each round is two survivor semi-joins on the undirected
    * edge list (vertex-keyed shuffles, no broadcast requirement) + one
    * map-side-combinable degree count; survivors shrink monotonically and
    * the lineage is cut per round like [[pageRankDF]]. Peel depth on
    * real-world (heavy-tailed) graphs is small; a chain-of-pendants
    * adversary needs O(chain length) rounds — that is a property the spec
    * exercises, and the `rounds` parameter makes the trade explicit
    * instead of unbounded.
    */
  /** Bucket count / version of the clustered endpoint copy behind
    * [[bucketedDegrees]].
    */
  val EndpBuckets: Int = 512
  val EndpVersion: String = "v1"

  /** Fact-edge parquet bytes above which the k-core init degrees come
    * from the bucketed endpoint table instead of the live union. Below
    * this, the exchange the bucketed table avoids is a few tens of MB
    * while its [[EndpBuckets]]-file scan has a fixed per-file open cost
    * (r16 sf0.1 A/B: bucketed aged 1.97 s vs union 1.42 s); above it the
    * exchange grows with 2|E| into the GBs that killed the sf100 probe
    * (r15 A/B: sf10 min 14.8 vs 71.6 s). 64 MB of fact-edge parquet
    * ≈ a few hundred MB exchanged — the measured crossover region.
    */
  val BucketedDegreeMinBytes: Long = 64L << 20

  /** Exchange-free initial degrees for the k-core peel (VERDICT r14 #6):
    * the derived graph's endpoint list stored ONCE per dataset as a Spark
    * bucketed table clustered+sorted on the vertex id, so `groupBy(a)`
    * runs on the scan's own HashPartitioning — the init degree count was
    * a ~36 GB map-side-combined exchange at sf100, the single-host disk
    * ceiling that stopped the d3 probe. The build pays that exchange once
    * (repartition aligned 1:1 with the bucket spec → one file per
    * bucket); every session after serves degree counts with zero shuffle.
    * Env-gated A/B (`GRAFT_KCORE_DEG=bucketed`) until the sf10 numbers
    * decide the default.
    */
  def bucketedDegrees(spark: SparkSession, sfDir: String): DataFrame = {
    val endp = graft.model.CacheDirs.cachedBucketedTable(spark, "graph", sfDir,
      s"endp_b${EndpBuckets}_$EndpVersion", EndpBuckets, "a") {
      val e = graft.model.DerivedGraph(spark, sfDir).edges.select("src", "dst")
      e.select(col("src").as("a")).unionAll(e.select(col("dst").as("a")))
        .repartition(EndpBuckets, col("a"))
    }
    endp.groupBy("a").agg(count(lit(1)).as("deg"))
  }

  def kCoreDF(edges: DataFrame, k: Int, rounds: Int = 10,
      initDegrees: Option[DataFrame] = None): DataFrame = {
    require(k >= 1, s"k must be ≥ 1, got $k")
    require(rounds >= 1, s"rounds must be ≥ 1, got $rounds")
    // und stays a LAZY view over the caller's edge frame — NOT a
    // localCheckpoint. The peel is shallow (≤3 rounds on every measured
    // graph family), so a materialized 2|E|-row copy can never amortize:
    // at sf10 (120M edges) the 240M-row deserialized checkpoint write
    // crossed the storage-region threshold and spilled, costing 105 s
    // against ~20 s of actual peel work (r13 probe) — a 22× decade ratio
    // from a 2-round query. Each consumer instead re-reads the input
    // (persisted graph cache / parquet scan) — two cheap columnar scans
    // per round. Input contract: `edges` must be materialization-stable
    // (persisted, checkpointed, or a scan), which every caller satisfies;
    // an unstable frame could present different rows to different rounds.
    val e = edges.select("src", "dst")
    val und = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .select(col("src").as("a"), col("dst").as("b"))
    // INCREMENTAL peel: degrees are counted over the full edge list ONCE;
    // each round subtracts the edges lost to that round's removed set
    // instead of re-counting survivors against survivors (which would
    // re-shuffle all |2E| rows every round — measured ~10× the query at
    // bench scale). deg_i(v) = deg_{i-1}(v) − |neighbours removed in
    // round i| is the same survivor sequence as the recompute form the
    // SQL oracle replays. The loss join's removed side starts at the
    // sub-k fringe and shrinks towards convergence — AQE picks the
    // broadcast side from its real size (no unsafe hint).
    val dbg = sys.env.contains("GRAFT_PEEL_DEBUG")
    def tick() = System.nanoTime()
    var t0 = tick()
    // initial degrees from a SINGLE-column endpoint union — half the
    // shuffle bytes of grouping the two-column und view. Callers with a
    // bucket-clustered endpoint copy pass `initDegrees` (exchange-free —
    // [[bucketedDegrees]]); the contract is that it equals this count
    // over the SAME edge frame.
    var deg = initDegrees.getOrElse(
      e.select(col("src").as("a"))
        .unionAll(e.select(col("dst").as("a")))
        .groupBy("a").agg(count(lit(1)).as("deg"))).localCheckpoint()
    if (dbg) println(f"[kcore] init deg: ${(tick() - t0) / 1e9}%.2f s")
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      r += 1
      t0 = tick()
      val removed = deg.filter(col("deg") < k)
        .select(col("a").as("rid")).localCheckpoint()
      // the count reads the checkpointed partition sizes (no recompute);
      // it sizes the loss join's build side below
      val nRemoved = removed.count()
      // an empty removed set makes every remaining round a no-op, so
      // stopping early returns the SAME result as running all `rounds` —
      // bounded-round semantics (and oracle parity) are unchanged.
      if (nRemoved == 0) converged = true
      else {
        // EXPLICIT broadcast below the same ~25M-row bound Traverse uses,
        // capped by this session's maxResultSize (a 1g-default session
        // gets ~22M, not a failed collect — ADVICE r15 #2): a first-round
        // fringe in the tens of millions (13M at sf100) is far past AQE's
        // broadcast threshold, and the SMJ alternative exchanges the
        // whole 2|E|-row und view (~29 GB at sf100 — the r15 probe's disk
        // ceiling); a ~100 MB hashed id set is cheap on any executor.
        // Past the bound, AQE's choice stands.
        val rem = if (nRemoved <= Traverse.effectiveBroadcastLimit(e.sparkSession))
          broadcast(removed) else removed
        val loss = und.join(rem, col("b") === col("rid"))
          .groupBy("a").agg(count(lit(1)).as("__lost"))
        deg = deg.filter(col("deg") >= k)
          .join(loss, Seq("a"), "left")
          .select(col("a"), (col("deg") - coalesce(col("__lost"), lit(0L))).as("deg"))
          .localCheckpoint()
      }
      if (dbg) println(f"[kcore] round $r removed=$nRemoved: ${(tick() - t0) / 1e9}%.2f s")
    }
    // deg now holds within-core degrees of the survivors; vertices whose
    // neighbours were all peeled in the final bounded round carry deg 0
    // and are edgeless in the core — the recompute/oracle form omits them.
    deg.filter(col("deg") > 0).select(col("a").as("id"), col("deg"))
  }

  /** k-truss decomposition by iterative edge peeling (Cohen, "Trusses:
    * cohesive subgraphs for social network analysis", NSA tech report
    * 2008): repeatedly drop edges supported by fewer than k−2 triangles
    * among the surviving edges; the fixpoint is the maximal subgraph
    * where every edge closes ≥ k−2 triangles — the EDGE-cohesion screen
    * one notch stronger than [[kCoreDF]]'s vertex degrees (every k-truss
    * is inside the (k−1)-core, not vice versa). `rounds` bounds the peel
    * like kCoreDF so the computation replays as chained SQL rounds;
    * convergence within the bound is proven per graph family in spec
    * (an extra round changes nothing), not assumed. Returns surviving
    * edges with their support measured in the FINAL edge set.
    *
    * Input contract: canonical undirected edges, `a < b`, distinct.
    *
    * 100 TB shape: support comes from degree-ordered triangle ENUMERATION
    * (the [[triangleCountDF]] orientation: each triangle materializes
    * exactly once at its base edge, then credits its three edges), NOT
    * from the naive wedge join — wedges that never close made the naive
    * form 122 s at sf0.1 where this one rides the triangle count (1.9M
    * triangles → 5.6M credit rows there, measured ~25× cheaper). Per
    * round: two vertex-keyed joins against the oriented adjacency, one
    * explode bounded by 3·triangles, one combinable per-edge count,
    * lineage cut per round; survivors shrink monotonically. Skewed hub
    * keys are AQE's skew-join case; no broadcast requirement.
    */
  /** Canonical triangle list (x < y < z, one row per triangle) of a
    * canonical undirected edge set (`a < b`, distinct) — the
    * [[triangleCountDF]] degree-ordered enumeration with the rows kept
    * instead of counted. Factored out of [[kTrussDF]] so the enumeration
    * can be computed once per (session, dataset) and SHARED between the
    * triangle count, the truss peel, and any future clustering-coefficient
    * style consumer (the sharedBfs "traverse once, derive many"
    * discipline applied to triangles).
    */
  def triangleListDF(t: DataFrame, broadcastSides: Boolean = false): DataFrame = {
    val hint: DataFrame => DataFrame =
      if (broadcastSides) broadcast(_) else identity
    val deg = hint(t.select(col("a").as("x")).unionAll(t.select(col("b").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d")))
    val withDeg = t
      .join(deg.select(col("x").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("x").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("b").as("w")))
        .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("o"))
      .select(col("o.u").as("u"), col("o.w").as("w"))
    val adj = hint(oriented.groupBy("u")
      .agg(sort_array(collect_list(col("w"))).as("nbrs")))
    oriented
      .join(adj.select(col("u"), col("nbrs").as("na")), Seq("u"))
      .join(adj.select(col("u").as("w"), col("nbrs").as("nb")), Seq("w"))
      .select(col("u"), col("w"),
        explode(array_intersect(col("na"), col("nb"))).as("v3"))
      // canonicalize the (degree,id)-oriented corners back to x < y < z
      .select(array_sort(array(col("u"), col("w"), col("v3"))).as("t"))
      .select(col("t").getItem(0).as("x"), col("t").getItem(1).as("y"),
        col("t").getItem(2).as("z"))
  }

  /** Watts–Strogatz local clustering coefficient per vertex:
    * cc(v) = 2·t(v)/(deg(v)·(deg(v)−1)) for deg ≥ 2, where t(v) counts
    * triangles incident to v. Derived entirely from a canonical
    * triangle list (one explode + combinable groupBy) and one
    * distinct-edge degree scan — no adjacency state, no new enumeration
    * when the caller passes the shared persisted list.
    *
    * Input contract: canonical undirected edges (`a < b`, distinct) and
    * their triangle list (x < y < z, one row per triangle).
    */
  def clusteringCoeffDF(canonicalEdges: DataFrame,
      triangleList: DataFrame): DataFrame = {
    val tcnt = triangleList
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
    val deg = canonicalEdges.select(col("a").as("id"))
      .unionAll(canonicalEdges.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    deg.filter(col("deg") >= 2)
      .join(tcnt, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round((lit(2L) * coalesce(col("n_tri"), lit(0L))).cast("double") /
          (col("deg") * (col("deg") - 1)).cast("double"), 6).as("cc"))
  }

  /** Version token for the [[kTrussDF]] peel ALGORITHM, folded into the
    * cross-session cache-entry name next to its k/rounds/co-projection
    * parameters (the CoEdgesVersion discipline, ADVICE r14): a future peel
    * bugfix must bump this so every session's correctness gate rebuilds
    * instead of silently serving the pre-fix converged frame. Version 1
    * maps to the legacy unversioned entry name, so bumping the CONSTANT —
    * not renaming an entry by hand — is the upgrade path, and existing v1
    * caches (sf10's took a 1404 s build) stay valid.
    */
  val KTrussVersion: Int = 1

  def kTrussDF(canonicalEdges: DataFrame, k: Int, rounds: Int = 6,
      broadcastSides: Boolean = false,
      triangleList: Option[DataFrame] = None): DataFrame = {
    require(k >= 3, s"k must be ≥ 3, got $k")
    require(rounds >= 1, s"rounds must be ≥ 1, got $rounds")
    // INCREMENTAL peel with the TRIANGLE LIST as state (the kCoreDF
    // discipline lifted to edges): enumerate every triangle ONCE
    // (canonical x < y < z), derive supports by exploding each triangle
    // into its three edges, then per round mark the triangles that
    // contain a removed edge (three small-side joins against the removed
    // fringe — broadcast-sized towards convergence) and charge each LOST
    // triangle's surviving edges exactly once. No adjacency rebuild, no
    // inclusion-exclusion: a triangle is a row, and a row dies once.
    // The survivor sequence is IDENTICAL to the per-round recompute the
    // SQL oracle replays (KTrussSpec pins this on graphs engineered to
    // hit multi-removal triangles), and the maintained supports equal the
    // oracle's final support pass at any converged round.
    def edgeOf(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
      struct(p.as("a"), q.as("b"))
    // a caller-provided (typically session-persisted) triangle list is
    // already materialization-stable — don't pay a checkpoint copy for it
    var tri = triangleList.getOrElse(
      triangleListDF(canonicalEdges.select("a", "b"), broadcastSides)
        .localCheckpoint())
    var sup = tri.select(explode(array(
        edgeOf(col("x"), col("y")), edgeOf(col("x"), col("z")),
        edgeOf(col("y"), col("z")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("support"))
      .localCheckpoint()
    // one cheap aggregate over the fresh checkpoint: the RELATIVE lazy
    // gate below needs the surviving triangle-edge count per round
    var nEdges = sup.count()
    // current edge COUNT is the only whole-edge-set state the loop needs
    // (survivor rows live in sup) — tracking it as a long avoids a
    // |E|-row materialization per round
    // Constant-depth tail state: once the fringe is tiny (≤ MaxLazyFringe),
    // rounds stop writing |T|/|E|-row checkpoints. Instead tri/sup become
    // LAZY views of the last CHECKPOINTED bases plus two cumulative tiny
    // broadcast deltas (removed edges; per-edge support charges). The view
    // depth is CONSTANT (≤3 broadcast probes) no matter how many tail
    // rounds run — the naive alternative (chaining each round's lazy
    // frames) re-executes the whole chain per round and measured 2.4×
    // SLOWER than the checkpoint-per-round form it replaced.
    var triBase = tri
    var supBase = sup
    var cumRemoved: Option[DataFrame] = None // (a,b) — all tail fringes
    var cumDec: Option[DataFrame] = None // (a,b,__dec) — summed charges
    var cumRemovedRows = 0L // broadcast-state row counts: once either
    var cumDecRows = 0L //     crosses MaxCumLazyRows the next round re-bases
    var r = 0
    var converged = false
    val dbg = sys.env.contains("GRAFT_KTRUSS_DEBUG")
    while (r < rounds && !converged) {
      r += 1
      val t0 = System.nanoTime()
      // zero-triangle edges never enter sup, so the survivor projection
      // drops them with the low-support rows — and being triangle-less
      // their removal charges nothing. keptSup stays LAZY (a cheap filter
      // over the checkpointed sup); BOTH round counts come from one
      // aggregate scan instead of a keptSup.count() plus three later
      // re-derivations of the fringe (measured: the per-round AQE
      // broadcast builds each rescanned the full |E|-row sup to re-filter
      // `removed` — ~7 s of the 13 s sf0.1 wall across the peel).
      val keptSup = sup.filter(col("support") >= k - 2)
      // ONE |E| scan per round: materialize the fringe first (tiny after
      // round 1 — the whole sf0.1 peel removes ~90k of 1.2M edges) and
      // read both round counts off its free checkpoint count. An empty
      // fringe IS the fixpoint: no removal → no triangle dies → no charge
      // — identical to the old nKept==nEdges check one no-op round later,
      // minus a redundant aggregate scan per round.
      val removed0 = sup.filter(col("support") < k - 2).select("a", "b")
        .localCheckpoint()
      val nRemoved = removed0.count()
      if (nRemoved == 0L) converged = true
      else {
        nEdges -= nRemoved // surviving triangle-edge rows, for the gate
        // hint broadcast only when the measured row count proves it fits
        // (scale-safe: a pathological first-round mass removal falls back
        // to a shuffle join under AQE).
        val fringeBroadcast = nRemoved <= MaxBroadcastFringe
        val removed: DataFrame =
          if (fringeBroadcast) broadcast(removed0) else removed0
        val flagged0 = tri
          .join(removed.select(col("a").as("x"), col("b").as("y"))
            .withColumn("__r1", lit(1)), Seq("x", "y"), "left")
          .join(removed.select(col("a").as("x"), col("b").as("z"))
            .withColumn("__r2", lit(1)), Seq("x", "z"), "left")
          .join(removed.select(col("a").as("y"), col("b").as("z"))
            .withColumn("__r3", lit(1)), Seq("y", "z"), "left")
        // Materialization strategy is fringe-size-gated (the convergence
        // tail was paying ~1-2 s/round of |T|-row checkpoint writes to
        // remove a handful of edges — rounds 3-7 at sf0.1 remove
        // 1681/658/81/21/4 edges yet cost as much as round 2):
        //  - BIG fringe (early rounds): checkpoint the flagged frame once;
        //    it serves both consumers (the dec charge and the survivor
        //    projection). An A/B against re-running the three kill joins
        //    per consumer measured the checkpoint faster here — at this
        //    size the probes over |T| rows dominate the extra write.
        //  - SMALL fringe (tail rounds): no |T|/|E|-row write. dec is
        //    extracted in one |T| scan (tiny result, checkpointed), folded
        //    into the cumulative deltas, and tri/sup are rebuilt as
        //    constant-depth lazy views over tri/supBase — per-round cost
        //    drops to two bulk SCANS (sup agg + dec) instead of two bulk
        //    WRITES.
        val lazyTail = fringeBroadcast &&
          nRemoved <= math.max(MaxLazyFringe, nEdges / 20L) &&
          cumRemovedRows + nRemoved <= MaxCumLazyRows &&
          cumDecRows <= MaxCumLazyRows
        val survives = col("__r1").isNull && col("__r2").isNull &&
          col("__r3").isNull
        // each lost triangle charges ONLY its surviving edges (a null
        // element survives the array and is dropped after the explode)
        def decOf(flagged: DataFrame): DataFrame = flagged.filter(!survives)
          .select(explode(array(
            when(col("__r1").isNull, edgeOf(col("x"), col("y"))),
            when(col("__r2").isNull, edgeOf(col("x"), col("z"))),
            when(col("__r3").isNull, edgeOf(col("y"), col("z"))))).as("e"))
          .filter(col("e").isNotNull)
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .groupBy("a", "b").agg(count(lit(1)).as("__dec"))
        // A lazy-candidate round extracts dec FIRST so the round's OWN
        // charge volume can veto the lazy path: the cumDecRows gate above
        // is retrospective (last round's folded count), and the first lazy
        // round after a re-base starts from 0 — a near-MaxBroadcastFringe
        // fringe losing ~3 charge rows per triangle could otherwise fold a
        // cumDec broadcast far above the MaxCumLazyRows ceiling in that
        // same round. The count is free on the fresh checkpoint, and a
        // vetoed round reuses the extracted charges in the re-base below.
        val lazyDec: Option[DataFrame] =
          if (!lazyTail) None else Some(decOf(flagged0).localCheckpoint())
        val lazyOk = lazyDec.exists(d => cumDecRows + d.count() <= MaxCumLazyRows)
        if (!lazyOk) {
          val flagged = flagged0.localCheckpoint()
          tri = flagged.filter(survives).select("x", "y", "z")
          sup = keptSup.join(lazyDec.getOrElse(decOf(flagged)), Seq("a", "b"), "left")
            .select(col("a"), col("b"),
              (col("support") - coalesce(col("__dec"), lit(0L))).as("support"))
            .filter(col("support") > 0)
            .localCheckpoint()
          // re-sync the surviving-edge count from the fresh checkpoint:
          // the running `nEdges -= nRemoved` decrement misses edges the
          // support>0 filter drops via charges alone, so across many
          // rounds nEdges would overstate |E| and widen the relative lazy
          // gate beyond the documented |E|/20 policy. Free on a checkpoint.
          nEdges = sup.count()
          // reset the tail bases to the fresh checkpoints
          triBase = tri; supBase = sup; cumRemoved = None; cumDec = None
          cumRemovedRows = 0L; cumDecRows = 0L
        } else {
          // one |T| scan through broadcast probes; the result is ≤3 rows
          // per lost triangle
          val dec = lazyDec.get
          cumRemoved = Some(cumRemoved.map(_.unionAll(removed0))
            .getOrElse(removed0).localCheckpoint())
          cumDec = Some(cumDec.map(_.unionAll(dec)).getOrElse(dec)
            .groupBy("a", "b").agg(sum(col("__dec")).as("__dec"))
            .localCheckpoint())
          cumRemovedRows += nRemoved
          cumDecRows = cumDec.get.count() // cheap: fresh checkpoint
          val rem = broadcast(cumRemoved.get)
          tri = triBase
            .join(rem.select(col("a").as("x"), col("b").as("y"))
              .withColumn("__k1", lit(1)), Seq("x", "y"), "left")
            .join(rem.select(col("a").as("x"), col("b").as("z"))
              .withColumn("__k2", lit(1)), Seq("x", "z"), "left")
            .join(rem.select(col("a").as("y"), col("b").as("z"))
              .withColumn("__k3", lit(1)), Seq("y", "z"), "left")
            .filter(col("__k1").isNull && col("__k2").isNull &&
              col("__k3").isNull)
            .select("x", "y", "z")
          // removed edges receive no charges after their triangles die, so
          // subtracting the cumulative charges and anti-joining the
          // cumulative fringe reproduces the incremental sequence exactly
          sup = supBase
            .join(broadcast(cumDec.get), Seq("a", "b"), "left")
            .select(col("a"), col("b"),
              (col("support") - coalesce(col("__dec"), lit(0L))).as("support"))
            .join(rem, Seq("a", "b"), "left_anti")
            .filter(col("support") > 0)
        }
      }
      if (dbg) println(f"[ktruss] round $r nRemoved=$nRemoved " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // support-0 rows never exist at a fixpoint; the filter above also
    // matches the oracle's final-pass convention (triangle-less edges
    // yield no row) if the round budget is exhausted mid-peel
    sup.select(col("a"), col("b"), col("support"))
  }

  /** Unweighted undirected BFS distances from a seed via an explicit Pregel
    * program — the k-hop traversal (mongraph.py:252-274 intent) as message
    * passing. Each superstep relaxes dist(v) = min(dist(v), dist(u)+1); the
    * stored graph stays directed (one copy) and each triplet relaxes BOTH
    * directions, matching the reference's undirected `$or` traversal
    * (mongraph.py:236-241). Messages stop once no distance improves;
    * unreachable vertices are omitted. `maxDepth` bounds the superstep
    * count exactly like the reference's depth parameter.
    */
  def bfsDistances[VD: ClassTag, ED: ClassTag](g: Graph[VD, ED], seed: Long, maxDepth: Int): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    val init = g.mapVertices((id, _) => if (id == seed) 0 else Int.MaxValue)
    val res = init.pregel(Int.MaxValue, maxIterations = maxDepth)(
      (_, dist, msg) => math.min(dist, msg),
      t => {
        val toDst = t.srcAttr != Int.MaxValue && t.srcAttr + 1 < t.dstAttr
        val toSrc = t.dstAttr != Int.MaxValue && t.dstAttr + 1 < t.srcAttr
        if (toDst && toSrc) Iterator((t.dstId, t.srcAttr + 1), (t.srcId, t.dstAttr + 1))
        else if (toDst) Iterator((t.dstId, t.srcAttr + 1))
        else if (toSrc) Iterator((t.srcId, t.dstAttr + 1))
        else Iterator.empty
      },
      (a, b) => math.min(a, b))
    res.vertices.filter(_._2 != Int.MaxValue)
      .map { case (id, d) => (id, d.toLong) }.toDF("id", "dist")
  }

  /** Multi-landmark shortest paths (unweighted, undirected) in ONE Pregel
    * traversal: each vertex carries a small `landmark → dist` map (GraphX's
    * ShortestPaths SPMap shape, with the same both-direction relaxation as
    * [[bfsDistances]] so the stored digraph stays single-copy). One
    * traversal for L landmarks instead of L — messages are ≤ L entries, so
    * the per-superstep shuffle grows by the landmark count, not the graph.
    * Unreachable (vertex, landmark) combinations are omitted.
    */
  def multiSourceBfs[VD: ClassTag, ED: ClassTag](g: Graph[VD, ED], seeds: Seq[Long],
      maxDepth: Int): DataFrame = {
    val spark = SparkSession.active
    import spark.implicits._
    type SP = Map[Long, Int]
    def merge(a: SP, b: SP): SP =
      (a.keySet ++ b.keySet).iterator.map { k =>
        k -> math.min(a.getOrElse(k, Int.MaxValue), b.getOrElse(k, Int.MaxValue))
      }.toMap
    val seedSet = seeds.toSet
    val init = g.mapVertices((id, _) =>
      if (seedSet.contains(id)) Map(id -> 0) else Map.empty[Long, Int])
    val res = init.pregel(Map.empty[Long, Int], maxIterations = maxDepth)(
      (_, m, msg) => merge(m, msg),
      t => {
        def improves(from: SP, at: SP): SP =
          from.iterator.map { case (k, v) => k -> (v + 1) }
            .filter { case (k, v) => v < at.getOrElse(k, Int.MaxValue) }.toMap
        val toDst = improves(t.srcAttr, t.dstAttr)
        val toSrc = improves(t.dstAttr, t.srcAttr)
        (if (toDst.nonEmpty) Iterator((t.dstId, toDst)) else Iterator.empty) ++
          (if (toSrc.nonEmpty) Iterator((t.srcId, toSrc)) else Iterator.empty)
      },
      merge)
    res.vertices.flatMap { case (id, m) =>
      m.iterator.map { case (lm, d) => (id, lm, d.toLong) }
    }.toDF("id", "landmark", "dist")
  }

  def bfsDistances(edges: DataFrame, seed: Long, maxDepth: Int = 10): DataFrame = {
    val parts = graphParts(edges.sparkSession.sparkContext, edges.count())
    val eRDD = toParts(edges.select("src", "dst").rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), 1)), parts)
    bfsDistances(Graph.fromEdges(eRDD, 0), seed, maxDepth)
  }

  /** Total triangle count of an undirected simple graph given canonical
    * (src < dst) distinct edges — GraphX `TriangleCount` (counts each
    * triangle once per corner → sum/3). Kept as the cross-check for
    * [[triangleCountDF]]; prefer the DataFrame plan at scale.
    */
  def triangleCount(canonicalEdges: DataFrame): Long = {
    val parts = graphParts(
      canonicalEdges.sparkSession.sparkContext, canonicalEdges.count())
    val eRDD = toParts(canonicalEdges.select("src", "dst").rdd
      .map(r => (r.getLong(0), r.getLong(1))), parts)
    val g = Graph.fromEdgeTuples(eRDD, defaultValue = 1)
      .partitionBy(PartitionStrategy.EdgePartition2D)
    g.triangleCount().vertices.map(_._2.toLong).fold(0L)(_ + _) / 3
  }

  /** Degree-ordered triangle count as a pure DataFrame plan — the classic
    * scalable formulation: orient every edge from its (degree, id)-smaller
    * endpoint to the larger (an acyclic total order, so each triangle
    * {a<b<c} is counted exactly once, at its base edge a→b with c in
    * N⁺(a) ∩ N⁺(b)), then intersect out-neighbor lists per edge. Work is
    * Σ_edges (|N⁺(u)|+|N⁺(w)|) with |N⁺| ≤ O(√m) — on a dense co-order
    * graph that's ~100× fewer operations than materializing every wedge
    * through a join, and the intersection is the codegen'd two-pointer
    * `sorted_intersect_count`.
    *
    * `broadcastSides = true` broadcasts the per-vertex degree table
    * (16 B/vertex) and the oriented adjacency table (~8 B/edge) — without
    * the hints AQE leaves all four joins as sort-merge (the collect_list
    * agg hides the adjacency side's true size from it), and the edge table
    * (the BIG side) shuffles and sorts four times, which profiling showed
    * was ~80% of the query. The hints keep the whole count ONE action (the
    * repeated edge-build subplans collapse via ReuseExchange) whose final
    * stage is a single codegen pass: edge scan → BHJ → BHJ → intersect →
    * partial sum. It is worth it ONLY while degree+adjacency fit an
    * executor/driver broadcast (~10⁷ edges); the library DEFAULT is
    * therefore `false` — shuffle joins that scale to any graph — and a
    * caller who KNOWS the graph is broadcast-sized opts in (the bench
    * query does; ADVICE r4: a default-on broadcast is an OOM trap on the
    * 100 TB regime this library targets).
    */
  def triangleCountDF(canonicalEdges: DataFrame, broadcastSides: Boolean = false): Long = {
    val e = canonicalEdges.select("src", "dst")
    val hint: DataFrame => DataFrame = if (broadcastSides) broadcast(_) else identity
    val deg = hint(e.select(col("src").as("x")).unionAll(e.select(col("dst").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d")))
    val withDeg = e
      .join(deg.select(col("x").as("src"), col("d").as("sd")), "src")
      .join(deg.select(col("x").as("dst"), col("d").as("dd")), "dst")
    val oriented = withDeg.select(
      when(struct(col("sd"), col("src")) < struct(col("dd"), col("dst")),
        struct(col("src").as("u"), col("dst").as("w")))
        .otherwise(struct(col("dst").as("u"), col("src").as("w"))).as("o"))
      .select(col("o.u").as("u"), col("o.w").as("w"))
    // sorted adjacency + the codegen'd two-pointer merge: zero allocation
    // per row, vs array_intersect's per-row hash set + result array.
    val adj = hint(oriented.groupBy("u")
      .agg(sort_array(collect_list(col("w"))).as("nbrs")))
    oriented
      .join(adj.select(col("u"), col("nbrs").as("na")), Seq("u"))
      .join(adj.select(col("u").as("w"), col("nbrs").as("nb")), Seq("w"))
      .agg(coalesce(sum(graft.functions.ArrayFunctions.sorted_intersect_count(
        col("na"), col("nb"))), lit(0L)).as("n"))
      .head().getLong(0)
  }

  /** Parts co-ordered in the same order — a triangle-rich projection of the
    * order/lineitem bipartite graph, canonical (a < b) distinct pairs.
    *
    * Built by the posting-list pattern (one groupBy into a sorted per-order
    * part set, pairs by double explode over the sorted list — a < b falls
    * out of the slice) rather than a self-join: one shuffle on the order
    * key instead of dedup-shuffle + join re-shuffle. The per-key buffer is
    * the order's distinct part set — bounded by order line count, so no
    * hot-key blowup.
    *
    * Disk-cached like the triangle list it feeds (fingerprint-validated,
    * [[graft.model.CacheDirs.cachedParquet]]): the projection is consumed
    * by FOUR query families (triangle count, truss peel, clustering
    * coefficient's degree pass, the enumeration build itself), and the
    * r13 sf10 probe showed clustering_coeff re-paying the lineitem
    * groupBy + wedge distinct (~120M-row shuffle) on every call — with
    * the cache each consumer gets a 2-column pruned parquet scan.
    */
  /** Definition version of the co-order projection, folded into every
    * cache-entry name that bakes the projection in (co_edges itself and
    * the triangle list enumerated from it — ADVICE r13): bump it when the
    * projection's semantics change so stale cross-session caches rebuild
    * instead of silently serving the old definition to correctness gates.
    */
  val CoEdgesVersion: Int = 1

  def coOrderPartEdges(spark: SparkSession, sfDir: String): DataFrame =
    graft.model.CacheDirs.cachedParquet(spark, "graph", sfDir,
      s"co_edges_v$CoEdgesVersion") {
      graft.model.Tables(spark, sfDir, "lineitem")
        // a NULL order key must produce no pairs (equi-join semantics of the
        // former self-join form) — groupBy would otherwise pool all NULL-key
        // rows into one group and fabricate co-order edges among them
        .filter(col("l_orderkey").isNotNull)
        .groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("__ps"))
        .select(col("__ps"), posexplode(col("__ps")).as(Seq("__i", "src")))
        .select(col("src"),
          explode(slice(col("__ps"), col("__i") + 2, size(col("__ps")))).as("dst"))
        .distinct()
    }

  /** Degree assortativity (Newman, "Assortative mixing in networks",
    * PRL 2002): Pearson correlation of endpoint degrees over the
    * undirected edge list (each edge contributes both orientations — the
    * standard symmetric form). Positive = hubs link to hubs, negative =
    * hub-and-spoke. Exact determinism: degrees are integers, the
    * correlation is recomputed from DECIMAL power sums exactly like
    * `agg_stats` (never the built-in corr, whose streaming accumulation
    * is order-dependent).
    *
    * Scale shape: one combinable degree count, two vertex-keyed joins of
    * the edge list against the |V|-row degree table (AQE broadcasts small
    * ones), one combinable power-sum aggregation. Per-value DECIMAL(18,6)
    * casts bound each x·y at 1e12 — degrees beyond ~10⁶ need a wider
    * scale parameter.
    *
    * Degenerate case: a REGULAR graph (every degree equal — one edge, a
    * cycle, a clique) has zero degree variance, so the correlation is
    * 0/0 and the column is NaN — the mathematically honest answer
    * (assortativity is undefined without degree variance; Pearson's r has
    * no value to report). Callers needing a sentinel should null it out
    * with `nanvl`/`when(isnan(...))`.
    */
  def degreeAssortativity(edges: DataFrame, roundScale: Int = 6,
      broadcastDeg: Boolean = false): DataFrame = {
    import graft.Qh
    val und = graft.model.DerivedGraph.undirected(edges)
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
    // The degree table is |V| rows with UNKNOWN post-aggregation stats, so
    // the planner sort-merges the edge list against it TWICE (one full
    // edge shuffle per endpoint). `broadcastDeg = true` hints both probe
    // sides instead — the edge list then never shuffles at all (measured
    // 3.85 → 1.6 s on the sf0.1 derived graph, Prof --assort). Same
    // opt-in-with-shuffle-default policy as triangleCountDF.broadcastSides:
    // safe while |V| is broadcast-sized (~10⁷ vertices at 16 B/row); past
    // that, keep the default and let the two shuffle joins scale out.
    val hint: DataFrame => DataFrame = if (broadcastDeg) broadcast(_) else identity
    val xy = und
      .join(hint(deg.select(col("a"), col("deg").as("x"))), "a")
      .join(hint(deg.select(col("a").as("b"), col("deg").as("y"))), "b")
    val nD = col("n").cast("double")
    xy.agg(count(lit(1)).as("n"),
        Qh.dsum(col("x")).as("sx"), Qh.dsum(col("y")).as("sy"),
        Qh.dsum(col("x") * col("y")).as("sxy"),
        Qh.dsum(col("x") * col("x")).as("sx2"),
        Qh.dsum(col("y") * col("y")).as("sy2"))
      .select(col("n"),
        round((nD * col("sxy") - col("sx") * col("sy")) /
          (sqrt(nD * col("sx2") - col("sx") * col("sx")) *
            sqrt(nD * col("sy2") - col("sy") * col("sy"))), roundScale)
          .as("assortativity"))
  }

  /** Landmark STRESS centrality (Shimbel 1953): the number of shortest
    * paths from the landmark set that pass THROUGH each vertex — the
    * betweenness family's exactly-countable member. Classic betweenness
    * sums FRACTIONS σ_st(v)/σ_st (Brandes 2001 accumulates them with
    * per-vertex divisions, which no exact cross-engine replay survives);
    * stress drops the normalization and counts paths, so the whole
    * two-pass Brandes structure stays in INTEGERS:
    *
    *   forward  (level-synchronous BFS):  σ(v) = Σ σ(u) over in-DAG edges
    *   backward (by descending depth):    h(v) = Σ_{w ∈ succ_DAG(v)} (1 + h(w))
    *   stress(v) = Σ_landmarks σ(v)·h(v)   for v not itself the landmark
    *
    * where h(v) counts shortest paths from v onward in the BFS DAG
    * (every shortest s→t path through v factors as σ_sv paths into v
    * times one path onward, so σ·h is exactly Shimbel's count).
    *
    * 100 TB shape: ≤2·maxDepth rounds of edge-keyed joins + combinable
    * groupBys (the pagerank cost ladder, ~2× for the two passes); the
    * frontier/level frames are |V|·L rows at worst, lineage cut per
    * round; no driver state, no global window. σ·h products are summed
    * as DECIMAL(38,0); at the gate graph (layered TPC-H derived graph,
    * diameter ≤ 8) values stay far below the BIGINT output cast — a
    * graph with 10¹⁸-path multiplicities moves the output column to
    * DECIMAL(38,0), same ladder.
    */
  /** `levels`, when given, is a precomputed (lm, id, dist) landmark-BFS
    * frame over the SAME edges/seeds/maxDepth (the shared
    * [[multiSourceBfs]] frame that shortest_paths/closeness/harmonic/
    * eccentricity already ride — VERDICT r17 #2). The forward pass then
    * keeps only σ propagation: the per-round `left_anti` against the
    * GROWING visited union (a driver broadcast re-collected every round,
    * |V|·L rows by the end) becomes a semi-join against the one level's
    * membership, the per-round isEmpty probe disappears (the frame's max
    * depth bounds the loop), and rounds past the graph's true depth are
    * never run. Row-identical to the standalone form
    * (GraphAnalyticsSpec pins parity) — levels only name WHICH vertices
    * sit at depth d, a fact both forms derive from the same BFS.
    */
  /** Backward-pass form switch (A/B only — see the in-loop comment):
    * `graft.stress.backsemi=1` pre-filters h-messages to the receiving
    * level's membership before the per-round groupBy. Row-identical by
    * construction; default stays the measured winner.
    */
  private[graft] def stressBackwardSemi: Boolean =
    sys.props.get("graft.stress.backsemi")
      .orElse(sys.env.get("GRAFT_STRESS_BACKSEMI")).contains("1")

  def stressCentralityDF(edges: DataFrame, seeds: Seq[Long],
      maxDepth: Int = 10, levels: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val spark = edges.sparkSession
    import spark.implicits._
    // static relation right-sized ONCE (the eigenvectorDF discipline:
    // an undirected union arrives as many narrow partitions and every
    // round re-pays that width as join-stage tasks)
    val undRaw = edges.select(col("a"), col("b")).localCheckpoint()
    val undCount = undRaw.count()
    val undTarget = math.max(
      spark.sparkContext.defaultParallelism.toLong,
      undCount / 4000000L + 1L).toInt
    val und =
      if (undRaw.rdd.getNumPartitions > undTarget) undRaw.coalesce(undTarget)
      else undRaw
    // per-round frontier/level frames are ≤|V|·L rows: keep them at a
    // small static width (a checkpointed RDD keeps its width; 20 rounds
    // × shuffle-partition-many near-empty partitions is pure task
    // overhead — the iterateWidth lesson)
    val w = 8
    def narrow(df: DataFrame): DataFrame = {
      val cut = df.localCheckpoint() // checkpoint FIRST: isEmpty must not
      if (cut.rdd.getNumPartitions > w) cut.coalesce(w) else cut
    } //                                re-execute the plan it just probed
    // forward: per landmark, level-synchronous frontier carrying σ
    var frontier = narrow(seeds.map(s => (s, s, 1L)).toDF("lm", "id", "sigma"))
    val sigmaLevels = scala.collection.mutable.ArrayBuffer((0, frontier))
    // the visited side is a union of CHECKPOINTED level frames — lineage
    // stays shallow without re-materializing an O(|V|) frame every round
    def visited = sigmaLevels.map(_._2.select("lm", "id")).reduce(_ unionAll _)
    // frontier/visited/h frames are ≤|V|·L rows — broadcast them so the
    // BIG side (und) never re-shuffles: each round is then a map-side
    // broadcast join + ONE combinable groupBy shuffle over the messages
    // (the pageRankDF broadcast-hinted rank⋈edge discipline). On a graph
    // past the broadcast ceiling (|V| bounded by the edge count; 50M
    // rows ≈ 1.2 GB of (lm,id,σ) triples) the hint drops and the same
    // plan runs as shuffle joins. r12 measured that regime one decade up
    // (120M edges) at 12.0× per 10× data, flat across partition widths,
    // and REJECTED two pre-partitioned-edge-copy variants on numbers
    // (BENCHNOTES r12 stress ladder): keyed+sorted serialized copies per
    // join key read aged 260 s vs this form's 246 s with cold 918 s vs
    // 500 s — the per-round message groupBy, not the edge exchange,
    // bounds the round, so the upfront copies only add build cost (and a
    // three-deserialized-copy variant OOM'd a 100g heap).
    val hintSmall: DataFrame => DataFrame =
      if (undCount <= 50000000L) broadcast(_) else identity
    def sigmaMessages(fr: DataFrame): DataFrame =
      hintSmall(fr).join(und, col("id") === col("a"))
        .groupBy(col("lm"), col("b"))
        .agg(sum(col("sigma")).as("sigma"))
        .select(col("lm"), col("b").as("id"), col("sigma"))
    levels match {
      case Some(lv) =>
        // ride the shared BFS frame: σ(v at depth d) = Σ σ(u at d−1) over
        // edges into EXACTLY the level-d membership — the semi-join
        // replaces the growing-visited anti-join, and the frame's max
        // depth replaces the per-round emptiness probe
        val maxD = math.min(maxDepth.toLong,
          lv.agg(max(col("dist"))).head().getLong(0)).toInt
        for (d <- 1 to maxD) {
          val lvlD = lv.filter(col("dist") === d).select(col("lm"), col("id"))
          val next = narrow(
            sigmaMessages(frontier).join(hintSmall(lvlD), Seq("lm", "id"), "left_semi"))
          frontier = next
          sigmaLevels += ((d, next))
        }
      case None =>
        var d = 0
        var exhausted = false
        while (d < maxDepth && !exhausted) {
          d += 1
          val next = narrow(
            sigmaMessages(frontier).join(hintSmall(visited), Seq("lm", "id"), "left_anti"))
          if (next.isEmpty) exhausted = true
          else {
            frontier = next
            sigmaLevels += ((d, next))
          }
        }
    }
    // backward: h by descending depth; the deepest level has no DAG
    // successors, so its h is the left-join's coalesce(…, 0)
    var hPrev: DataFrame = null
    val scored = sigmaLevels.reverseIterator.map { case (_, lvl) =>
      val withH = if (hPrev == null)
        lvl.withColumn("h", lit(0L))
      else {
        // successor columns renamed BEFORE the join — levels share
        // attribute lineage through the forward pass, and an lm==lm
        // condition would otherwise lean on self-join disambiguation
        val msgs = und.join(
            hintSmall(hPrev.select(col("lm").as("__slm"), col("id").as("__w"), col("h"))),
            col("b") === col("__w"))
        // frame-driven backward form (VERDICT r18 #7): h-messages from
        // level d+1 only matter at level-d receivers (BFS-DAG edges go
        // depth d → d+1); the left join below drops the rest AFTER the
        // groupBy has shuffled them. The semi-join filters them map-side
        // BEFORE the agg — row-identical output (the dropped (lm, a)
        // groups are exactly the left join's misses). MEASURED AND
        // REJECTED (CentralityAB entry, BENCHNOTES r19): +5 jobs/run
        // from the per-round membership broadcast builds, wall 7.11 vs
        // 6.24-6.99 s at sf0.1 — fails the ≥10%-at-both-SFs bar at the
        // first SF, so the default stays off; flag kept for re-probing.
        val kept = if (stressBackwardSemi)
          msgs.join(hintSmall(lvl.select(col("lm").as("__slm"), col("id").as("a"))),
            Seq("__slm", "a"), "left_semi")
        else msgs
        val succ = kept
          .groupBy(col("__slm"), col("a"))
          .agg(sum(lit(1L) + col("h")).as("__hs"))
        lvl.join(succ,
            col("lm") === col("__slm") && col("id") === col("a"), "left")
          .select(col("lm"), col("id"), col("sigma"),
            coalesce(col("__hs"), lit(0L)).as("h"))
      }
      val cut = narrow(withH)
      hPrev = cut
      cut
    }.toSeq
    scored.reduce(_ unionAll _)
      .filter(col("id") =!= col("lm"))
      .groupBy("id")
      .agg(sum(col("sigma").cast(DecimalType(38, 0)) * col("h"))
        .cast("long").as("stress_units"))
      .orderBy(col("stress_units").desc, col("id"))
      .limit(100)
  }
}
