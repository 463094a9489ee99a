package graft

import org.apache.spark.sql.functions._
import graft.ops.Windows

/** Parity contract for the RateView streaming twin of ts_changepoint:
  * after every folded batch, the view's changepoint equals the batch
  * query (cusumChangepoint over minuteCounts) on the union of all
  * batches so far. Two splits are proven: a time-ordered one (the
  * watermark-style arrival every other twin assumes) and a SHUFFLED one
  * with out-of-order minutes across batches — the abelian-merge claim
  * that distinguishes this twin.
  */
class ChangepointStreamSpec extends SparkSpec {
  import spark.implicits._

  private def events(minutes: Seq[(Int, Int)]): Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] = {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var id = 0L
    minutes.flatMap { case (m, cnt) =>
      (0 until cnt).map { _ =>
        id += 1
        (id, new java.sql.Timestamp(t0.getTime + m * 60000L), 1L, "click", 1.0, "{}")
      }
    }
  }

  private def toDf(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  private def assertParity(batches: Seq[Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]]): Unit = {
    val view = new Windows.RateView(spark)
    var prefix = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
    batches.zipWithIndex.foreach { case (b, i) =>
      prefix ++= b
      view.processBatch(toDf(b))
      val got = view.changepoint.as[(Long, Long, Long, Long)].collect().toSeq
      val want = Windows.cusumChangepoint(Windows.minuteCounts(toDf(prefix)))
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(got == want, s"batch $i: view $got vs batch query $want")
    }
  }

  // level shift at minute 30: 10/min before, 20/min after
  private val series = (0 until 60).map(m => (m, if (m < 30) 10 else 20))

  test("time-ordered batches: per-prefix parity with the batch query") {
    assertParity(Seq(
      events(series.slice(0, 20)),
      events(series.slice(20, 40)),
      events(series.slice(40, 60))))
  }

  test("out-of-order batches: abelian merge makes parity split-invariant") {
    // minutes interleaved across batches, later minutes arriving FIRST —
    // would break a watermark-style fold, must not break this one
    val shuffled = Seq(
      series.filter(_._1 % 3 == 2), // the tail third arrives first
      series.filter(_._1 % 3 == 0),
      series.filter(_._1 % 3 == 1))
    assertParity(shuffled.map(events))
    // and a split that cuts WITHIN a minute (same bucket across batches)
    val all = events(series)
    val (odd, even) = all.partition(_._1 % 2 == 1)
    assertParity(Seq(odd, even))
  }

  test("state stays minute-bounded") {
    val view = new Windows.RateView(spark)
    view.processBatch(toDf(events(series)))
    view.processBatch(toDf(events(series))) // same minutes again
    assert(view.stateSize == 60L)
  }
}
