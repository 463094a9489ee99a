package graft

import graft.ops.Windows

/** Parity contract for the DriftView streaming twin of ks_drift: after
  * every folded batch, the view's KS statistic equals the batch query
  * (ksDrift) on the union of all batches so far. Like RateView, the
  * per-value count state merges as an abelian group, so parity must hold
  * under a SHUFFLED split with out-of-order values across batches — not
  * just time-ordered arrival.
  */
class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (String, Double)

  private def toDf(rows: Seq[Ev]) = rows.toDF("event_type", "value")

  private def assertParity(batches: Seq[Seq[Ev]]): Unit = {
    val view = new Windows.DriftView(spark)
    var prefix = Seq.empty[Ev]
    batches.zipWithIndex.foreach { case (b, i) =>
      prefix ++= b
      view.processBatch(toDf(b))
      val got = view.drift
        .as[(Long, Long, Long, Double, Double, Boolean)].collect().toSeq
      val want = Windows.ksDrift(toDf(prefix))
        .as[(Long, Long, Long, Double, Double, Boolean)].collect().toSeq
      assert(got == want, s"batch $i: view $got vs batch query $want")
    }
  }

  private val clicks = Seq(0.5, 1.2, 1.9, 2.4, 3.1, 3.8, 4.0, 4.4, 5.2, 6.0)
  private val purch = Seq(3.5, 4.1, 5.9, 6.6, 7.2, 8.0, 8.8, 9.5)
  private val all: Seq[Ev] =
    clicks.map(("click", _)) ++ purch.map(("purchase", _)) ++
      Seq(("view", 2.0), ("error", 9.9)) // ignored types flow through batches

  test("time-ordered batches: per-prefix parity with the batch query") {
    assertParity(all.sortBy(_._2).grouped(7).toSeq)
  }

  test("out-of-order batches: abelian merge makes parity split-invariant") {
    // high values arrive first, duplicates of one value split across
    // batches — would break an append-only ECDF, must not break this fold
    val withDups = all ++ Seq(("click", 4.0), ("purchase", 3.5))
    val (hi, lo) = withDups.partition(_._2 > 4.0)
    assertParity(Seq(hi, lo))
  }

  test("state is bounded by distinct values of the two tested types") {
    val view = new Windows.DriftView(spark)
    view.processBatch(toDf(all))
    view.processBatch(toDf(all)) // same values again: no state growth
    assert(view.stateSize ==
      (clicks ++ purch).distinct.size.toLong)
  }
}
