package graft

import org.apache.spark.sql.functions._

/** Unit specs for the round-10c/d operators. Oracle parity at sf0.01 is
  * the correctness gate; these pin SEMANTICS on hand-built inputs where
  * the expected values are recomputed by an independent plain-Scala
  * reimplementation.
  */
class R10dOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Independent brute-force two-sample KS in integer units. */
  private def bruteKs(a: Seq[Double], b: Seq[Double]): (Long, Long, Long) = {
    val pts = (a ++ b).distinct.sorted
    val n1 = a.size.toLong; val n2 = b.size.toLong
    val units = pts.map { v =>
      val f1 = a.count(_ <= v).toLong
      val f2 = b.count(_ <= v).toLong
      math.abs(f1 * n2 - f2 * n1)
    }.max
    (n1, n2, units)
  }

  test("ks_drift matches a brute-force ECDF comparison (drift present)") {
    // clicks uniform-ish low, purchases shifted high — clear drift
    val clicks = Seq(0.5, 1.2, 1.9, 2.4, 3.1, 3.8, 4.0, 4.4, 5.2, 6.0)
    val purch = Seq(3.5, 4.1, 5.9, 6.6, 7.2, 8.0, 8.8, 9.5)
    val ev = (clicks.map(("click", _)) ++ purch.map(("purchase", _)) ++
      Seq(("view", 2.0), ("error", 9.9))) // other types must be ignored
      .toDF("event_type", "value")
    val (n1, n2, units) = bruteKs(clicks, purch)
    val got = graft.ops.Windows.ksDrift(ev)
      .select("n1", "n2", "ks_units", "reject_05")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val ks = units.toDouble / (n1 * n2)
    val crit = 1.358 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2))
    assert(got == Seq((n1, n2, units, ks > crit)))
  }

  test("ks_drift on identical samples is zero and does not reject") {
    val vs = Seq(1.0, 2.0, 3.0, 4.5)
    val ev = (vs.map(("click", _)) ++ vs.map(("purchase", _)))
      .toDF("event_type", "value")
    val got = graft.ops.Windows.ksDrift(ev)
      .select("ks_units", "ks", "reject_05")
      .as[(Long, Double, Boolean)].collect().toSeq
    assert(got == Seq((0L, 0.0, false)))
  }

  test("ks_drift ties across buckets: duplicate values collapse to one ECDF point") {
    // values straddle integer-bucket boundaries and repeat within/across
    // samples — the two-level prefix sum must agree with the flat ECDF
    val clicks = Seq(0.9, 1.0, 1.0, 1.1, 2.0, 2.0)
    val purch = Seq(1.0, 1.1, 1.1, 3.0)
    val ev = (clicks.map(("click", _)) ++ purch.map(("purchase", _)))
      .toDF("event_type", "value")
    val (n1, n2, units) = bruteKs(clicks, purch)
    val got = graft.ops.Windows.ksDrift(ev)
      .select("n1", "n2", "ks_units").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((n1, n2, units)))
  }
}
