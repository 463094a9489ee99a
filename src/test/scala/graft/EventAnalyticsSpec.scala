package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ops.Windows

/** Hand-checked event analytics: the time-bounded sequential funnel and
  * the weekly retention cohorts.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel: stage per user honors order AND the step window") {
    val events = Seq(
      // user 1: full conversion inside the 2h windows → stage 3
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:10:00")),
      (1L, "purchase", ts("2024-01-01 10:20:00")),
      // user 2: click 3h after view (outside window) → stage 1
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "click", ts("2024-01-01 13:00:00")),
      // user 3: click only, never viewed → stage 0
      (3L, "click", ts("2024-01-01 10:00:00")),
      // user 4: purchase 4h after click → stage 2
      (4L, "view", ts("2024-01-01 10:00:00")),
      (4L, "click", ts("2024-01-01 10:30:00")),
      (4L, "purchase", ts("2024-01-01 14:31:00")),
      // user 5: purchase BEFORE the click → not a qualifying step → stage 2
      (5L, "view", ts("2024-01-01 10:00:00")),
      (5L, "purchase", ts("2024-01-01 10:05:00")),
      (5L, "click", ts("2024-01-01 10:30:00"))
    ).toDF("user_id", "event_type", "ts")
    val got = Windows.funnel(events)
      .select("user_id", "stage").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 1L, 3L -> 0L, 4L -> 2L, 5L -> 2L))
  }

  test("funnel: earliest qualifying timestamps are reported, later steps NULL") {
    val events = Seq(
      (1L, "view", ts("2024-01-01 09:00:00")),
      (1L, "view", ts("2024-01-01 08:00:00")),   // earlier view wins
      (1L, "click", ts("2024-01-01 08:30:00"))
    ).toDF("user_id", "event_type", "ts")
    val r = Windows.funnel(events).head()
    assert(r.getAs[Timestamp]("t_view") == ts("2024-01-01 08:00:00"))
    assert(r.getAs[Timestamp]("t_click") == ts("2024-01-01 08:30:00"))
    assert(r.getAs[Timestamp]("t_purchase") == null)
    assert(r.getAs[Long]("stage") == 2L)
  }

  test("property: funnel stages match an independent in-memory evaluator") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val steps = Seq("view", "click", "purchase")
    val withinMs = 2L * 3600 * 1000
    // independent greedy evaluator: earliest occurrence of each step
    // strictly after and within the window of the previous one
    def ref(evs: Seq[(Long, String, Long)]): Map[Long, Long] =
      evs.groupBy(_._1).map { case (u, es) =>
        var stage = 0
        var last = 0L
        var advanced = true
        while (advanced && stage < steps.length) {
          val cand = es.collect {
            case (_, typ, t) if typ == steps(stage)
              && (stage == 0 || (t > last && t <= last + withinMs)) => t
          }
          if (cand.nonEmpty) { last = cand.min; stage += 1 } else advanced = false
        }
        u -> stage.toLong
      }
    val base = ts("2024-01-01 00:00:00").getTime
    val evGen = Gen.chooseNum(1, 40).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.chooseNum(1L, 5L),
      Gen.oneOf("view", "click", "purchase", "error"),
      // minute-granularity offsets up to ~5h → windows genuinely bind
      Gen.chooseNum(0L, 300L).map(m => base + m * 60000))))
    val p = Prop.forAll(evGen) { evs =>
      val df = evs.map { case (u, ty, t) => (u, ty, new Timestamp(t)) }
        .toDF("user_id", "event_type", "ts")
      val got = Windows.funnel(df).select("user_id", "stage")
        .as[(Long, Long)].collect().toMap
      got == ref(evs)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  test("trailingSum: time-RANGE frame includes exactly-1h-old and peer rows") {
    val events = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, ts("2024-01-01 11:00:00"), 2.0),  // exactly 1h later: frame holds both
      (3L, 1L, ts("2024-01-01 12:00:01"), 4.0),  // 1h01s after #2 → #2 now out
      (4L, 1L, ts("2024-01-01 12:00:01"), 8.0),  // same-instant peer of #3
      (5L, 2L, ts("2024-01-01 10:30:00"), 16.0)  // other user: own partition
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Windows.trailingSum(events)
      .select("event_id", "trailing_sum").as[(Long, Double)].collect().toMap
    // #2 sees #1 (exactly 1h earlier → INCLUSIVE bound); #3/#4 are RANGE
    // peers (same timestamp), each seeing both, with #1 and #2 aged out
    assert(got == Map(1L -> 1.0, 2L -> 3.0, 3L -> 12.0, 4L -> 12.0, 5L -> 16.0))
  }

  test("declared attribution query = clickAttribution batch rows (sf0.001)") {
    // ties the stream_join_attribution QueryDef to the operator whose
    // streaming twin StreamingWindowSpec exercises — the three copies of
    // the lookback now share Windows.AttributionLookback, and this check
    // makes the "batch twin" claim enforced, not just documented.
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val ev = graft.model.Tables(spark, d, "events")
    val viaOp = Windows.clickAttribution(
      ev.filter(col("event_type") === "click").select("user_id", "ts", "value"),
      ev.filter(col("event_type") === "purchase").select("user_id", "ts", "value"))
      .select("user_id", "purchase_ts", "click_ts")
      .as[(Long, Timestamp, Timestamp)].collect().toSeq.sorted
    val idTs = ev.select("event_id", "ts").as[(Long, Timestamp)].collect().toMap
    val viaQuery = Queries.all("stream_join_attribution").fn(spark, d)
      .as[(Long, Long, Long)].collect().toSeq
      .map { case (u, pid, cid) => (u, idTs(pid), idTs(cid)) }.sorted
    assert(viaQuery == viaOp && viaQuery.nonEmpty)
  }

  test("retentionCohorts: cohort = first-seen week, offsets in whole weeks") {
    val events = Seq(
      (1L, "view", ts("2024-01-02 10:00:00")),  // week of Mon 2024-01-01
      (1L, "view", ts("2024-01-16 10:00:00")),  // +2 weeks
      (2L, "view", ts("2024-01-10 10:00:00")),  // week of Mon 2024-01-08
      (2L, "view", ts("2024-01-08 00:00:00")),  // same week (boundary)
      (2L, "view", ts("2024-01-15 10:00:00"))   // +1 week
    ).toDF("user_id", "event_type", "ts")
    val got = Windows.retentionCohorts(events)
      .as[(java.sql.Date, Long, Long)].collect().toSet
    assert(got == Set(
      (java.sql.Date.valueOf("2024-01-01"), 0L, 1L),
      (java.sql.Date.valueOf("2024-01-01"), 2L, 1L),
      (java.sql.Date.valueOf("2024-01-08"), 0L, 1L),
      (java.sql.Date.valueOf("2024-01-08"), 1L, 1L)))
  }
}
