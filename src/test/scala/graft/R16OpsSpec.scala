package graft

import org.apache.spark.sql.functions._
import graft.model.DerivedGraph
import graft.ops.Traverse

/** Round-16 contracts: the policy-dependent traversal span cutoff
  * (VERDICT r15 #4), the session-aware broadcast-collect bound
  * (ADVICE r15 #1/#2), and the containment rewrite's plan shape — hashed
  * 8-byte shingle keys, in-row per-doc dedup (no distinct shuffle of the
  * exploded strings), broadcast sizes join (VERDICT r15 #1).
  */
class R16OpsSpec extends SparkSpec {
  import spark.implicits._

  private def mkAdj(policy: String, samePlan: Boolean = false): DerivedGraph.Adj = {
    val und = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
      .withColumn("bk", pmod(col("a"), lit(64L)).cast("int"))
    if (samePlan) DerivedGraph.Adj(und, und, 64, policy)
    else DerivedGraph.Adj(und.filter(col("bk") >= 0), und, 64, policy)
  }

  test("spanCutoff per storage policy: none=full span, disk=2/3, default=1/2") {
    assert(Traverse.spanCutoff(mkAdj("none", samePlan = true)) == 64)
    assert(Traverse.spanCutoff(mkAdj("none")) == 64)
    assert(Traverse.spanCutoff(mkAdj("disk")) == 42)
    assert(Traverse.spanCutoff(mkAdj("default")) == 32)
    // an unknown/legacy policy string falls into the conservative default
    assert(Traverse.spanCutoff(mkAdj("default-lowmem")) == 32)
    // full eq byBucket always means nothing is cached — prune whenever
    // possible, regardless of what the policy string claims
    assert(Traverse.spanCutoff(mkAdj("default", samePlan = true)) == 64)
  }

  test("spanCutoff tiny-adjacency guard: sub-64MB entries cap the pruned span") {
    val small = mkAdj("default").copy(bytes = 1L << 20)
    assert(Traverse.spanCutoff(small) == 4) // buckets/16, narrow hops only
    val big = mkAdj("default").copy(bytes = Traverse.PrunedScanMinBytes)
    assert(Traverse.spanCutoff(big) == 32)
    // the guard never disables pruning entirely (seed hops always win)
    assert(Traverse.spanCutoff(
      DerivedGraph.Adj(mkAdj("default").full, mkAdj("default").byBucket,
        buckets = 8, policy = "default", bytes = 1L)) == 1)
  }

  test("effectiveBroadcastLimit caps the static 25M bound by maxResultSize") {
    // LITERAL pins of the 48 B/row charge (ADVICE r17: the former
    // recompute-the-same-expression check was tautological — a regression
    // in the 48 or the min would have passed unnoticed):
    // 1 GiB / 48 B = 22,369,621 rows, under the 25M static bound
    assert(Traverse.effectiveBroadcastLimitFor(1L << 30, 25000000L) == 22369621L)
    // 4 GiB admits the full static limit (the tool/bench builders' value)
    assert(Traverse.effectiveBroadcastLimitFor(4L << 30, 25000000L) == 25000000L)
    // maxResultSize=0 means unlimited — the static bound stands alone
    assert(Traverse.effectiveBroadcastLimitFor(0L, 25000000L) == 25000000L)
    // a forced-low static (GRAFT_BCAST_LIMIT) only LOWERS the bound
    assert(Traverse.effectiveBroadcastLimitFor(1L << 30, 1000000L) == 1000000L)

    // and the session path wires the session's ACTUAL maxResultSize into
    // that arithmetic (skip under an ambient GRAFT_BCAST_LIMIT override)
    assume(sys.env.get("GRAFT_BCAST_LIMIT").isEmpty,
      "GRAFT_BCAST_LIMIT set in the ambient environment")
    val bytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.driver.maxResultSize", "1g"))
    assert(Traverse.effectiveBroadcastLimit(spark) ==
      Traverse.effectiveBroadcastLimitFor(bytes, Traverse.broadcastRowLimit))
  }

  test("containment: hashed-shingle plan broadcasts the sizes join and never " +
      "shuffles the exploded strings through a distinct") {
    val docs = (0L until 40L)
      .map(i => (i, s"doc-$i-" + ("abcdefghij" * 8) + s"-tail-${i % 7}"))
      .toDF("doc_id", "text")
    val out = graft.ops.llm.Dedup.containment(docs)
    out.collect() // finalize AQE so the adaptive plan holds the real joins
    def flatten(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: flatten(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          q +: flatten(q.plan)
        case n => Seq(n)
      }
    val exec = out.queryExecution.executedPlan
    val nodes = flatten(exec)
    // the per-doc set-size table (one row per document) broadcast-joins —
    // the exploded postings are never reshuffled to meet it
    assert(nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      s"sizes join did not broadcast:\n$exec")
    // no sort-merge join anywhere: every join in the containment plan is
    // either broadcast or absent (the pair table joins nothing)
    assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec]),
      s"unexpected sort-merge join:\n$exec")
    // shingle keys are longs end-to-end: no string-typed shuffle attribute
    // named "sh" survives into any exchange
    val exchanges = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(exchanges.forall(_.output.forall(a =>
        a.name != "sh" || a.dataType == org.apache.spark.sql.types.LongType)),
      s"a string shingle column reached an exchange:\n$exec")
  }

  test("containment values unchanged by the hashed rewrite (plain-Scala replay)") {
    // same fixture class as the R10d test, independent replay with RAW
    // string shingles — hashing must not change any emitted value
    val prefix = ('a' to 'z').mkString * 4
    val big = prefix + ("0123456789" * 30)
    val mid = ("qrstuvwxyz" * 12) + prefix.take(100)
    val docs = Seq((0L, prefix), (1L, big), (2L, mid), (3L, "zyxw" * 30))
      .toDF("doc_id", "text")
    def shingles(t: String): Set[String] =
      (1 to (t.length - 19) by 5).map(p => t.substring(p - 1, p - 1 + 20)).toSet
    val sets = Map(0L -> shingles(prefix), 1L -> shingles(big),
      2L -> shingles(mid), 3L -> shingles("zyxw" * 30))
    val expect = (for {
      a <- sets.keys; b <- sets.keys if a < b
      inter = (sets(a) & sets(b)).size.toDouble if inter > 0
      ca = math.rint(inter / sets(a).size * 1e6) / 1e6
      cb = math.rint(inter / sets(b).size * 1e6) / 1e6
      if math.max(ca, cb) >= 0.8
    } yield (a, b, inter.toLong, ca, cb)).toSet
    val got = graft.ops.llm.Dedup.containment(docs)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(got == expect)
  }
}
