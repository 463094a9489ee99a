package graft

/** Plan-shape audit of the round-10 operators (PlanShapeR7Spec
  * discipline): the shuffle/broadcast claims the scaladocs make must be
  * visible in the executed plan.
  */
class PlanShapeR10Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    val df = Queries.all(q).fn(spark, sf)
    df.collect() // let AQE finalize the real joins
    df.queryExecution.executedPlan.toString
  }

  test("graph_walks: frontier broadcasts every step, edges never sort-merge") {
    // the final walk plan is a union over eagerly-checkpointed per-step
    // leaves since r17 (the step joins execute inside the checkpoint jobs
    // — RandomWalks.stepCandidates scaladoc): pin THAT shape — a union of
    // materialized leaves with no join resurfacing in the final plan (the
    // former no-SortMergeJoin assertion was vacuously true of any
    // union-of-leaves plan, ADVICE r17) — and the broadcast claim on a
    // step's OWN plan, built exactly as walksCore builds it
    val p = planOf("graph_walks")
    assert(p.contains("Union"), s"expected a union of per-step leaves:\n$p")
    assert(!p.contains("Join"),
      s"step joins must stay inside the checkpoint jobs, not the final plan:\n$p")
    import org.apache.spark.sql.functions.col
    val adj = graft.model.DerivedGraph.undAdjacency(spark, sf)
    val seeds = {
      import spark.implicits._
      (1L to 32L).map(graft.model.DerivedGraph.CustomerBase + _).toDF("walk_id")
    }
    val frontier = seeds.select(col("walk_id"), col("walk_id").as("node"))
    val step = graft.ops.RandomWalks.stepCandidates(frontier, adj.full,
      Some((adj.byBucket, adj.buckets, graft.ops.Traverse.spanCutoff(adj))),
      walkCount = 32L, step = 1)
    step.collect()
    val sp = step.queryExecution.executedPlan.toString
    assert(sp.contains("BroadcastHashJoin"), s"no broadcast join in step:\n$sp")
    assert(!sp.contains("SortMergeJoin"), s"step sort-merged the edges:\n$sp")
  }

  test("quality_encoding: map-only — no exchange at all") {
    val df = Queries.all("quality_encoding").fn(spark, sf)
    df.collect()
    // the final orderBy's range exchange is the ONLY permitted one;
    // the counting itself must add no shuffle
    val exchanges = "Exchange".r
      .findAllIn(df.queryExecution.executedPlan.toString).size
    assert(exchanges <= 2, // rangepartitioning exchange (+AQE reprint)
      s"encoding screen must not shuffle for the counts: $exchanges exchanges")
  }

  test("unpivot_long: generate only, no join, no aggregate") {
    val p = planOf("unpivot_long")
    assert(!p.contains("Join"), s"unpivot must not join:\n$p")
    assert(!p.contains("HashAggregate"), s"unpivot must not aggregate:\n$p")
    assert(p.contains("Generate"), s"expected the explode Generate:\n$p")
  }

  test("outlier_mad: stats frames broadcast back, no cartesian") {
    val p = planOf("outlier_mad")
    assert(!p.contains("CartesianProduct"), s"mad plan:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"median/MAD stats joins must broadcast:\n$p")
  }

  test("dedup_substring and window_ewma: no cartesian, single window pass for ewma") {
    val p1 = planOf("dedup_substring")
    assert(!p1.contains("CartesianProduct"), s"substring plan:\n$p1")
    val p2 = planOf("window_ewma")
    assert(!p2.contains("CartesianProduct"), s"ewma plan:\n$p2")
    // the 16 lag taps and row_number must ride ONE window operator (plus
    // AQE's reprint); a second real window would mean a second sort/pass
    val windows = "\\bWindow\\b".r.findAllIn(p2).size
    assert(windows <= 2, s"expected one window pass, got $windows:\n$p2")
  }
}
