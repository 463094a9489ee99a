package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphAnalytics

/** r19 flag-path parity pins. Each centrality optimization this round
  * adopted (pagerank literal normalize, eigen/hits folded renorm fetch)
  * or rejected-but-kept-replayable (stress backward semi-join) ships with
  * a sys-prop switch the interleaved A/B tools flip; these tests pin that
  * both sides of every switch produce identical rows on hand-built
  * fixtures, so a future edit cannot silently fork the paths the A/B
  * evidence equates.
  */
class R19OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val v = (1L to 6L).map(i => (i, "x", s"v$i")).toDF("id", "label", "name")
  private lazy val e = Seq((1L, 2L, "e"), (2L, 3L, "e"), (1L, 3L, "e"),
    (3L, 4L, "e"), (5L, 6L, "e")).toDF("src", "dst", "label")

  private def withProp[A](k: String, value: String)(f: => A): A = {
    sys.props(k) = value
    try f finally sys.props -= k
  }

  test("pagerank: literal final normalize (default) == crossJoin(broadcast) form") {
    val lit = GraphAnalytics.pageRankDF(v, e).as[(Long, Double)].collect().toSeq.sorted
    val cj = withProp("graft.pr.crossjoin", "1") {
      GraphAnalytics.pageRankDF(v, e).as[(Long, Double)].collect().toSeq.sorted
    }
    assert(lit == cj)
  }

  test("eigenvector + hits: folded renorm fetch (default) == eager per-round checkpoint") {
    // strongly connected (3-cycle + chord), so the renormalized iterate
    // keeps mass — the same reason GraphAnalyticsSpec's eigen test uses it
    // (on a DAG the power iteration drains to zero and renorm divides by 0)
    val cv = Seq(1L, 2L, 3L).map(i => (i, "x", s"v$i")).toDF("id", "label", "name")
    val ce = Seq((1L, 2L, "e"), (2L, 3L, "e"), (3L, 1L, "e"), (1L, 3L, "e"))
      .toDF("src", "dst", "label")
    val eigF = GraphAnalytics.eigenvectorDF(cv, ce, 8).as[(Long, Double)].collect().toSeq.sorted
    val hitsF = GraphAnalytics.hitsDF(cv, ce, 4).collect().map(_.toString).toSeq.sorted
    val (eigE, hitsE) = withProp("graft.renorm.eager", "1") {
      (GraphAnalytics.eigenvectorDF(cv, ce, 8).as[(Long, Double)].collect().toSeq.sorted,
        GraphAnalytics.hitsDF(cv, ce, 4).collect().map(_.toString).toSeq.sorted)
    }
    assert(eigF == eigE)
    assert(hitsF == hitsE)
  }

  test("stress: backward semi-join (flag) == plain backward pass, with and without shared levels") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val und = (edges ++ edges.map(p => (p._2, p._1))).toDF("a", "b")
    val levels = Seq(
      (1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 2L), (1L, 5L, 3L),
      (5L, 5L, 0L), (5L, 4L, 1L), (5L, 2L, 2L), (5L, 3L, 2L), (5L, 1L, 3L))
      .toDF("lm", "id", "dist")
    for (lv <- Seq(None, Some(levels))) {
      val plain = GraphAnalytics.stressCentralityDF(und, Seq(1L, 5L), 10, levels = lv)
        .as[(Long, Long)].collect().toSeq
      val semi = withProp("graft.stress.backsemi", "1") {
        GraphAnalytics.stressCentralityDF(und, Seq(1L, 5L), 10, levels = lv)
          .as[(Long, Long)].collect().toSeq
      }
      assert(semi == plain, s"backsemi diverged (levels=${lv.isDefined})")
    }
  }
}
