package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.ops.Windows

/** Batch/streaming unification: the same Windows.tumbling transform runs
  * under Structured Streaming and produces the batch answer.
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val rows = Seq(
    (ts("2024-01-01 00:01:00"), "click", 1.0),
    (ts("2024-01-01 00:04:00"), "click", 2.0),
    (ts("2024-01-01 00:11:00"), "click", 4.0),
    (ts("2024-01-01 00:12:00"), "view", 8.0),
    (ts("2024-01-01 00:25:00"), "click", 16.0))

  test("streamingTumbling over a stream equals tumbling over the batch") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double)]
    val q = Windows.streamingTumbling(stream.toDF().toDF("ts", "event_type", "value"))
      .writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    try {
      stream.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .orderBy("bucket", "event_type").collect().toSeq
      val batch = Windows.tumbling(rows.toDF("ts", "event_type", "value"))
        .orderBy("bucket", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.size == 4) // 3 buckets, one split by event_type
    } finally q.stop()
  }

  test("stateful running totals accumulate across micro-batches (flatMapGroupsWithState)") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, Double)]
    val q = graft.ops.Stateful.runningUserTotals(stream.toDF().toDF("user_id", "value"))
      .writeStream.outputMode("update").format("memory").queryName("state_out").start()
    try {
      stream.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      stream.addData((1L, 2.0)) // second batch must see prior state
      q.processAllAvailable()
      val byBatch = spark.table("state_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(byBatch.contains((1L, 2L, 15.0))) // after batch 1
      assert(byBatch.contains((1L, 3L, 17.0))) // state carried into batch 2
      assert(byBatch.contains((2L, 1L, 1.0)))
    } finally q.stop()
  }

  test("streaming exact dedup: duplicate text across micro-batches is dropped, first arrival wins") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val q = graft.ops.llm.Dedup.exactStreaming(
      stream.toDF().toDF("ts", "doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      stream.addData(
        (ts("2024-01-01 00:00:00"), 1L, "the quick brown fox"),
        (ts("2024-01-01 00:01:00"), 2L, "THE QUICK BROWN FOX "), // dup after normalization
        (ts("2024-01-01 00:02:00"), 3L, "something else"))
      q.processAllAvailable()
      stream.addData(
        (ts("2024-01-01 00:03:00"), 4L, "the quick brown fox"), // dup across batches
        (ts("2024-01-01 00:04:00"), 5L, "genuinely new"))
      q.processAllAvailable()
      val kept = spark.table("dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 5L)) // 2 (same batch) and 4 (cross-batch) dropped
    } finally q.stop()
  }

  test("streaming sessions: a session is emitted once the watermark passes its close") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Double)]
    val q = graft.ops.Windows.streamingSessions(
      stream.toDF().toDF("ts", "user_id", "value"), gap = "30 minutes", watermark = "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      stream.addData(
        (ts("2024-01-01 00:00:00"), 1L, 1.0),
        (ts("2024-01-01 00:10:00"), 1L, 1.0)) // one session, closes 00:40
      q.processAllAvailable()
      // advance the watermark far past the session close → session finalizes
      stream.addData((ts("2024-01-01 02:00:00"), 2L, 1.0))
      q.processAllAvailable()
      val out = spark.table("sess_out")
        .select("user_id", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(out == Seq((1L, 2L))) // user 1's merged 2-event session; user 2 still open
    } finally q.stop()
  }

  test("streaming funnel: state advances across micro-batches; window still enforced") {
    implicit val ctx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Timestamp)]
    val q = graft.ops.Stateful.streamingFunnel(
      stream.toDF().toDF("user_id", "event_type", "ts"))
      .writeStream.outputMode("update").format("memory").queryName("funnel_out").start()
    try {
      // batch 1: user 1 views+clicks; user 2 views; user 3 clicks (no view)
      stream.addData(
        (1L, "view", ts("2024-01-01 10:00:00")),
        (1L, "click", ts("2024-01-01 10:10:00")),
        (2L, "view", ts("2024-01-01 10:00:00")),
        (3L, "click", ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      // batch 2: user 1 purchases in-window (state crossed the batch
      // boundary); user 2 clicks 3h after the view → outside the window
      stream.addData(
        (1L, "purchase", ts("2024-01-01 10:20:00")),
        (2L, "click", ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      val byUser = spark.table("funnel_out")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("stage").as("stage"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(byUser == Map(1L -> 3L, 2L -> 1L, 3L -> 0L))
      // cross-check vs the batch funnel over the union of both batches
      val allEvents = Seq(
        (1L, "view", ts("2024-01-01 10:00:00")),
        (1L, "click", ts("2024-01-01 10:10:00")),
        (2L, "view", ts("2024-01-01 10:00:00")),
        (3L, "click", ts("2024-01-01 10:00:00")),
        (1L, "purchase", ts("2024-01-01 10:20:00")),
        (2L, "click", ts("2024-01-01 13:00:00"))).toDF("user_id", "event_type", "ts")
      val batchStages = Windows.funnel(allEvents)
        .select("user_id", "stage").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(batchStages == byUser)
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attribute to in-window clicks only") {
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Double)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    def df(m: MemoryStream[(Long, Timestamp, Double)]) =
      m.toDF().toDF("user_id", "ts", "value")
    val q = Windows.clickAttribution(df(clicks), df(purchases))
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    try {
      clicks.addData(
        (1L, ts("2024-01-01 10:00:00"), 0.0),  // 20 min before → attributed
        (1L, ts("2024-01-01 09:00:00"), 0.0),  // 80 min before → outside lookback
        (2L, ts("2024-01-01 10:15:00"), 0.0))  // other user
      purchases.addData((1L, ts("2024-01-01 10:20:00"), 99.0))
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("user_id", "click_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      assert(got == Set((1L, ts("2024-01-01 10:00:00"))))
      // batch twin: the same function over batch frames gives the same rows
      val cb = Seq((1L, ts("2024-01-01 10:00:00"), 0.0),
        (1L, ts("2024-01-01 09:00:00"), 0.0),
        (2L, ts("2024-01-01 10:15:00"), 0.0)).toDF("user_id", "ts", "value")
      val pb = Seq((1L, ts("2024-01-01 10:20:00"), 99.0)).toDF("user_id", "ts", "value")
      val batch = Windows.clickAttribution(cb, pb)
        .select("user_id", "click_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("sessions: merge is inclusive at exactly the gap; strictly greater splits") {
    val data = Seq(
      (ts("2024-01-01 00:00:00"), 1L, 1.0),
      (ts("2024-01-01 00:30:00"), 1L, 1.0), // exactly gap after → still merges
      (ts("2024-01-01 01:00:01"), 1L, 1.0), // 30:01 after → new session
      (ts("2024-01-01 02:00:00"), 2L, 1.0)).toDF("ts", "user_id", "value")
    val out = Windows.sessions(data).orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getLong(3) == 2) // first session holds the boundary event
    assert(out(1).getLong(3) == 1)
  }
}
