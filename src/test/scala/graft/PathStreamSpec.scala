package graft

import graft.ops.Windows

/** Parity contract for the PathView streaming twin of path_mining: after
  * every folded batch, the view's trigram counts equal the batch query
  * (pathTrigrams) over the union of all batches so far — under the
  * SessionView contract (micro-batches split the stream in event-time
  * order), including splits that cut a user's trigram across batches
  * (the carry-in tail supplies the two-event context).
  */
class PathStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, java.sql.Timestamp, Long, String)
  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def at(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)

  private def toDf(rows: Seq[Ev]) =
    rows.toDF("event_id", "ts", "user_id", "event_type")

  private def assertParity(batches: Seq[Seq[Ev]]): Unit = {
    val view = new Windows.PathView(spark)
    var prefix = Seq.empty[Ev]
    batches.zipWithIndex.foreach { case (b, i) =>
      prefix ++= b
      view.processBatch(toDf(b))
      val got = view.trigrams
        .as[(String, String, String, Long)].collect().toSet
      val want = Windows.pathTrigrams(toDf(prefix))
        .as[(String, String, String, Long)].collect().toSet
      assert(got == want, s"batch $i: view $got vs batch query $want")
    }
  }

  // two interleaved users; u1: v c v c p, u2: v c v
  private val all: Seq[Ev] = Seq(
    (1L, at(0), 1L, "view"), (2L, at(1), 2L, "view"),
    (3L, at(2), 1L, "click"), (4L, at(3), 2L, "click"),
    (5L, at(4), 1L, "view"), (6L, at(5), 2L, "view"),
    (7L, at(6), 1L, "click"), (8L, at(7), 1L, "purchase"))

  test("per-prefix parity, split cutting every user's trigrams across batches") {
    // batches of 3 events in time order: each split leaves a partial
    // trigram context in the tail
    assertParity(all.grouped(3).toSeq)
  }

  test("per-prefix parity under single-event batches (maximal fragmentation)") {
    assertParity(all.grouped(1).toSeq)
  }

  test("one batch equals the batch query directly") {
    assertParity(Seq(all))
  }

  test("a trigram is never double-counted when a batch is context-only") {
    val view = new Windows.PathView(spark)
    view.processBatch(toDf(all))
    // a later batch for a NEW user must not recount old trigrams
    view.processBatch(toDf(Seq((9L, at(10), 3L, "view"))))
    val got = view.trigrams.as[(String, String, String, Long)].collect().toSet
    val want = Windows.pathTrigrams(toDf(all))
      .as[(String, String, String, Long)].collect().toSet
    assert(got == want)
  }

  test("state is bounded at two rows per user") {
    val view = new Windows.PathView(spark)
    view.processBatch(toDf(all))
    view.processBatch(toDf(Seq((9L, at(10), 3L, "view"))))
    assert(view.stateSize == 5L) // 2 + 2 + 1 (u3 has one event)
  }
}
