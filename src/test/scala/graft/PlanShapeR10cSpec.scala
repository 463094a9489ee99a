package graft

/** Plan-shape audit of the round-10b operators: the shuffle/broadcast
  * claims their scaladocs make must be visible in the executed plan
  * (PlanShapeR7Spec discipline).
  */
class PlanShapeR10cSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String = {
    val df = Queries.all(q).fn(spark, sf)
    df.collect() // let AQE finalize the real joins
    df.queryExecution.executedPlan.toString
  }

  test("bm25_retrieval: term table broadcasts, no cartesian") {
    val p = planOf("bm25_retrieval")
    assert(!p.contains("CartesianProduct"), s"bm25 plan:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 2-row term semi-join must broadcast:\n$p")
  }

  test("ngram_pmi: count-table joins only, no cartesian") {
    val p = planOf("ngram_pmi")
    assert(!p.contains("CartesianProduct"), s"pmi plan:\n$p")
  }

  test("mask_spans: pure per-doc window + agg — no join anywhere") {
    val p = planOf("mask_spans")
    assert(!p.contains("Join"), s"mask_spans must not join:\n$p")
    assert(p.contains("Window"), s"expected the per-doc lag window:\n$p")
  }

  test("split_holdout: map-side assignment, no join") {
    val p = planOf("split_holdout")
    assert(!p.contains("Join"), s"split assignment must not join:\n$p")
  }

  test("rfm_segment: bucket offsets broadcast back, no cartesian") {
    val p = planOf("rfm_segment")
    assert(!p.contains("CartesianProduct"), s"rfm plan:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"globalRowNumber offsets + the 1-row total must broadcast:\n$p")
  }

  test("graph_rich_club: vertex-keyed joins only, no cartesian") {
    val p = planOf("graph_rich_club")
    assert(!p.contains("CartesianProduct"), s"rich-club plan:\n$p")
  }

  test("ts_autocorr: lag self-join rides the minute table, no cartesian") {
    val p = planOf("ts_autocorr")
    assert(!p.contains("CartesianProduct"), s"autocorr plan:\n$p")
  }

  test("ts_changepoint: two-level prefix sum — per-row windows bucket-partitioned") {
    // re-sharded in r13 (VERDICT r12 #4): the running sum over the minute
    // table now rides twoLevelPrefixSum, so the plan carries TWO window
    // passes — the ≤1025-row bucket-offset frame (the only unpartitioned
    // one, enforced separately by GlobalWindowContractSpec's allowlist)
    // and the __bk-partitioned per-row pass. Broadcast offsets, never a
    // cartesian.
    val df = Queries.all("ts_changepoint").fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"changepoint plan:\n$p")
    val unpartitioned = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.size <= 1,
      s"only the bucket-offset window may be unpartitioned:\n$p")
  }
}
