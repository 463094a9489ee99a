package graft

/** Plan-shape audit of the round-7 operators (the CurationSpec audit
  * class): the claims the scaladocs make about shuffles/broadcasts must
  * be visible in the executed plan, not just asserted in prose.
  */
class PlanShapeR7Spec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    val df = Queries.all(q).fn(spark, sf)
    df.collect() // let AQE finalize the real joins
    df.queryExecution.executedPlan.toString
  }

  test("bloom_semi_join: filter side broadcasts, probe never cartesians") {
    val p = planOf("bloom_semi_join")
    assert(!p.contains("CartesianProduct"), s"cartesian in:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"the words-bounded filter must broadcast:\n$p")
  }

  test("layout_zorder: only the 1-row min/max stats broadcast, no cartesian") {
    // the r9 scale fix normalizes keys into the 16-bit cell domain via a
    // broadcast of the 1-row min/max stats (the outlier_zscore pattern) —
    // that broadcast is the ONLY join allowed; the data side never shuffles
    // for it and nothing cartesians
    val p = planOf("layout_zorder")
    assert(!p.contains("CartesianProduct"), s"zorder cartesians:\n$p")
    assert(!p.contains("SortMergeJoin"), s"zorder stats join must broadcast:\n$p")
  }

  test("shuffle_deterministic: at most one single-partition exchange (the bucket table)") {
    val p = planOf("shuffle_deterministic")
    // the ONE bucket-table window's exchange — AQE's plan string prints
    // the broadcast subtree twice (original + finalized), so allow 2
    // occurrences of the same exchange; per-doc rows never pass one
    // (ShuffleSpec proves the rank equals the global-window form)
    val single = "Exchange SinglePartition".r.findAllIn(p).size
    assert(single <= 2,
      s"expected only the bucket-table single-partition exchange, got $single:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"bucket offsets must broadcast back:\n$p")
  }

  test("sketch_cms_topk: the 4096-row sketch broadcasts to the probe side") {
    val p = planOf("sketch_cms_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"sketch join must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("scd2_upsert and graph_closeness: no cartesian anywhere") {
    Seq("scd2_upsert", "graph_closeness").foreach { q =>
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan:\n$p")
    }
  }

  test("data_quality_checks: one aggregation scan + one anti-join, nothing else") {
    val p = planOf("data_quality_checks")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("LeftAnti"), s"FK check must be an anti-join:\n$p")
  }

  test("fuzzy_match_blocked: the pair join is block-keyed, never cartesian") {
    val p = planOf("fuzzy_match_blocked")
    assert(!p.contains("CartesianProduct"), s"blocking must bound the quadratic:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"pair join must be equi on the block key:\n$p")
  }
}
