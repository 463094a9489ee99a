package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.llm.Mixture

/** Stride-scheduling mixture: the closed-form global position must equal
  * the windowed rank of the (vt, source, k) order, every prefix must hold
  * the weight shares to within the classic ±1-per-source stride bound,
  * and the schedule must be layout-invariant.
  */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (0 until 60)
    .map(i => (i.toLong, s"s${i % 3}"))
    .toDF("doc_id", "source")

  test("global_pos is exactly the windowed (vt, source, k) rank — a dense 1..N permutation") {
    val sched = Mixture.interleaveSources(docs, Map("s0" -> 3, "s1" -> 2))
    val w = Window.orderBy("vt", "source", "k")
    val check = sched
      .withColumn("__rk", row_number().over(w).cast("long"))
      .filter(col("global_pos") =!= col("__rk"))
    assert(check.count() == 0, "closed-form position diverged from the windowed rank")
    val n = sched.count()
    assert(sched.agg(max("global_pos"), min("global_pos")).as[(Long, Long)].head() == ((n, 1L)))
  }

  test("weight shares hold in every prefix to the stride bound (±1 per source)") {
    // weights s0=3, s1=2, s2=1 → expected share of a length-p prefix is
    // p·w/6, within 1 per source (stride scheduling's lag bound). The
    // bound only holds while no source is exhausted, so doc counts are
    // proportional to weights (30/20/10) — all sources run dry together
    // at vt = 60.
    val prop = (0 until 60).map { i =>
      (i.toLong, if (i % 6 < 3) "s0" else if (i % 6 < 5) "s1" else "s2")
    }.toDF("doc_id", "source")
    val sched = Mixture.interleaveSources(prop, Map("s0" -> 3, "s1" -> 2))
      .select("global_pos", "source").as[(Long, String)].collect().sortBy(_._1)
    val weights = Map("s0" -> 3.0, "s1" -> 2.0, "s2" -> 1.0)
    for (p <- 1 to sched.length) {
      val prefix = sched.take(p)
      weights.foreach { case (s, w) =>
        val got = prefix.count(_._2 == s)
        val want = p * w / 6.0
        assert(math.abs(got - want) <= 1.0,
          s"prefix $p: source $s has $got rows, expected ~$want")
      }
    }
  }

  test("unknown sources get the default weight; single-source degenerates to identity") {
    val solo = (1L to 5L).map(i => (i, "only")).toDF("doc_id", "source")
    val got = Mixture.interleaveSources(solo, Map("absent" -> 7))
      .orderBy("global_pos")
      .select("global_pos", "doc_id").as[(Long, Long)].collect().toSeq
    assert(got == (1L to 5L).map(i => (i, i)).toSeq)
  }

  test("layout-invariant: same schedule under repartitioning") {
    val a = Mixture.interleaveSources(docs, Map("s0" -> 3, "s1" -> 2))
      .orderBy("global_pos").collect().toSeq
    val b = Mixture.interleaveSources(docs.repartition(13), Map("s0" -> 3, "s1" -> 2))
      .orderBy("global_pos").collect().toSeq
    assert(a == b)
  }
}
