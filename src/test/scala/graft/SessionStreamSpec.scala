package graft

import org.apache.spark.sql.functions._

/** Proves the SessionView streaming twin's parity contract: for
  * time-ordered batch splits, closed ∪ open equals the batch
  * [[graft.ops.Windows.sessions]] over each prefix. The real-data run
  * checks parity at scale; the synthetic run forces the hard cases — a
  * session MERGING across a batch boundary (including at exactly `gap`,
  * the boundary-inclusive semantics) and a new session closing the old.
  */
class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def assertParity(got: org.apache.spark.sql.DataFrame,
      expect: org.apache.spark.sql.DataFrame, label: String): Unit = {
    assert(got.count() == expect.count(),
      s"$label: ${got.count()} vs ${expect.count()} sessions")
    val joined = got.join(expect,
      Seq("user_id", "session_start", "last_ts", "n"))
    assert(joined.count() == expect.count(), s"$label: session mismatch")
  }

  test("SessionView per-prefix equality with batch sessions on real events") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.model.Tables(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .localCheckpoint()
    val ranked = ev.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))))
    val n = ranked.count()
    val bounds = Seq(n / 4, n / 2, 3 * n / 4, n)
    val view = new graft.ops.Windows.SessionView(spark)
    var lo = 0L
    for (hi <- bounds) {
      val batch = ranked.filter(col("__rn") > lo && col("__rn") <= hi)
        .drop("__rn")
      view.processBatch(batch)
      val prefix = ranked.filter(col("__rn") <= hi).drop("__rn")
      val expect = graft.ops.Windows.sessions(prefix)
        .select("user_id", "session_start", "last_ts", "n")
      assertParity(view.currentSessions, expect, s"prefix rn<=$hi")
      lo = hi
    }
    assert(view.stateSize > 0)
  }

  test("SessionView merges across the batch boundary, inclusively at gap") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(t0 + min * 60000L)
    def df(rows: Seq[(Long, Long, Long)]) = rows
      .map { case (id, u, m) => (id, ts(m), u, "click", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // batch 1: user 1 session {0,10}; user 2 session {5}
    val b1 = df(Seq((1L, 1L, 0L), (2L, 1L, 10L), (3L, 2L, 5L)))
    // batch 2: user 1 at 40 = exactly gap after 10 -> MERGES (inclusive);
    //          user 1 at 200 -> new session, closing the merged one;
    //          user 2 at 50 -> > gap after 5, old singleton closes
    val b2 = df(Seq((4L, 1L, 40L), (5L, 1L, 200L), (6L, 2L, 50L)))
    val view = new graft.ops.Windows.SessionView(spark)
    view.processBatch(b1)
    val closed2 = view.processBatch(b2)
      .select("user_id", "session_start", "last_ts", "n")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().sortBy(r => (r._1, r._2.getTime))
    // closed by batch 2: user 1's merged {0,10,40} and user 2's {5}
    assert(closed2.toSeq == Seq(
      (1L, ts(0), ts(40), 3L), (2L, ts(5), ts(5), 1L)))
    val expect = graft.ops.Windows.sessions(b1.unionByName(b2))
      .select("user_id", "session_start", "last_ts", "n")
    assertParity(view.currentSessions, expect, "synthetic prefix")
    assert(view.stateSize == 2) // one open session per user
  }
}
