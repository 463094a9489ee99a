package graft

import org.apache.spark.sql.functions._

/** Parity contract for the SlidingHllView streaming twin of
  * sketch_hll_sliding: after every folded batch, the view's per-window
  * estimates equal the batch pipeline on the union of all batches.
  * Registers merge by MAX (join-semilattice: idempotent + commutative),
  * so parity must hold under a SHUFFLED split AND under replayed
  * duplicate batches — the strongest twin contract class.
  */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, java.sql.Timestamp, Long, String, Double)
  private val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  private def mkRows: Seq[Ev] = {
    var id = 0L
    for {
      h <- Seq(0, 1, 2, 4) // gap at hour 3
      u <- 1 to (20 + 7 * h)
    } yield {
      id += 1
      (id, new java.sql.Timestamp(t0.getTime + h * 3600000L), u.toLong, "click", 1.0)
    }
  }

  private def toDf(rows: Seq[Ev]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def batchWindows(rows: Seq[Ev]) = {
    val dir = java.nio.file.Files.createTempDirectory("hllstream").toString
    rows.map { case (id, ts, u, et, v) => (id, ts, u, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    Queries.all("sketch_hll_sliding").fn(spark, dir)
      .select("w_end", "v_zero", "z_scaled", "est_hll")
      .as[(Long, Long, Long, Double)].collect().toSet
  }

  private def viewWindows(view: graft.ops.SlidingHllView) =
    view.windows.as[(Long, Long, Long, Double)].collect().toSet

  test("per-prefix parity under a shuffled split") {
    val rows = mkRows
    // high-hour events arrive FIRST — an append-only fold would break
    val (hi, lo) = rows.partition(_._2.getTime > t0.getTime + 90 * 60000L)
    val view = new graft.ops.SlidingHllView(spark)
    view.processBatch(toDf(hi))
    assert(viewWindows(view) == batchWindows(hi))
    view.processBatch(toDf(lo))
    assert(viewWindows(view) == batchWindows(rows))
  }

  test("replayed duplicate batch cannot move a register (idempotence)") {
    val rows = mkRows
    val view = new graft.ops.SlidingHllView(spark)
    view.processBatch(toDf(rows))
    val before = viewWindows(view)
    val state = view.stateSize
    view.processBatch(toDf(rows)) // exact replay
    assert(viewWindows(view) == before)
    assert(view.stateSize == state)
  }
}
