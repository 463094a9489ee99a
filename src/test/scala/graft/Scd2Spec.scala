package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Scd2, SnapshotDiff}

/** SCD2 history invariants: per-key at most one open row and
  * non-overlapping intervals, and the time-travel contract — asOf(v)
  * reconstructs snapshot v exactly for EVERY version in the chain,
  * including a seeded randomized 4-snapshot sweep.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def chain(snaps: Seq[(DataFrame, Long)]): DataFrame =
    Scd2.fromSnapshots(snaps, Seq("id"))

  private def snap(rows: Seq[(Long, String, Double)]): DataFrame =
    rows.toDF("id", "grp", "v")

  private def canon(df: DataFrame): Set[(Long, String, Double)] =
    df.select("id", "grp", "v").as[(Long, String, Double)].collect().toSet

  test("invariants: one open row per surviving key, intervals never overlap") {
    val a = snap(Seq((1L, "g1", 1.0), (2L, "g1", 2.0), (3L, "g2", 3.0)))
    val b = snap(Seq((1L, "g1", 1.0), (2L, "g2", 2.5), (4L, "g3", 4.0))) // 3 deleted
    val c = snap(Seq((1L, "g9", 9.0), (2L, "g2", 2.5), (4L, "g3", 4.0), (3L, "g2", 30.0)))
    val h = chain(Seq(a -> 1L, b -> 2L, c -> 3L)).cache()
    // at most one open row per key; exactly one for keys in the last snapshot
    val open = h.filter(col("valid_to").isNull).groupBy("id").count()
    assert(open.filter(col("count") > 1).count() == 0)
    assert(open.count() == 4) // keys 1,2,3,4 all live in c
    // intervals are well-formed and non-overlapping per key
    val rows = h.select("id", "valid_from", "valid_to")
      .as[(Long, Long, Option[Long])].collect().toSeq
    rows.foreach { case (_, f, t) => t.foreach(tt => assert(tt > f)) }
    rows.groupBy(_._1).values.foreach { ivs =>
      val sorted = ivs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq((_, _, t1), (_, f2, _)) => assert(t1.exists(_ <= f2))
        case _ =>
      }
    }
  }

  test("deleted keys close without reopening; history rows only accrete") {
    val a = snap(Seq((1L, "g1", 1.0), (2L, "g1", 2.0)))
    val b = snap(Seq((1L, "g1", 1.0)))
    val h = chain(Seq(a -> 1L, b -> 2L))
    val k2 = h.filter(col("id") === 2).select("valid_from", "valid_to")
      .as[(Long, Option[Long])].collect().toSeq
    assert(k2 == Seq((1L, Some(2L))))
    assert(h.count() == 2)
  }

  test("time travel: asOf(v) == snapshot v for every version in the chain") {
    val a = snap(Seq((1L, "g1", 1.0), (2L, "g1", 2.0), (3L, "g2", 3.0)))
    val b = snap(Seq((2L, "g2", 2.5), (3L, "g2", 3.0), (4L, "g3", 4.0)))
    val c = snap(Seq((2L, "g2", 2.5), (4L, "g9", 40.0), (5L, "g5", 5.0)))
    val h = chain(Seq(a -> 10L, b -> 20L, c -> 30L)).cache()
    assert(canon(Scd2.asOf(h, 10L)) == canon(a))
    assert(canon(Scd2.asOf(h, 19L)) == canon(a)) // between versions: still a
    assert(canon(Scd2.asOf(h, 20L)) == canon(b))
    assert(canon(Scd2.asOf(h, 30L)) == canon(c))
    assert(canon(Scd2.asOf(h, 99L)) == canon(c))
  }

  test("checkOrder rejects an out-of-order version loudly") {
    val a = snap(Seq((1L, "g1", 1.0)))
    val b = snap(Seq((1L, "g1", 2.0)))
    val h = Scd2.init(a, 5L)
    val d = SnapshotDiff.diff(a, b, Seq("id"))
    intercept[IllegalArgumentException] {
      Scd2.applyDelta(h, d, Seq("id"), 5L, checkOrder = true)
    }
    // an EMPTY history has no max version: any version is acceptable
    // (no NPE on the null aggregate)
    val empty = Scd2.init(a.filter(col("id") < 0), 1L)
    assert(Scd2.applyDelta(empty, d, Seq("id"), 2L, checkOrder = true)
      .count() >= 0)
  }

  test("streaming: delta micro-batches fold into the history batch by batch") {
    implicit val ctx = spark.sqlContext
    // delta rows in SnapshotDiff shape: (id, change, old_val?, new_val?)
    val deltas = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Option[(String, Double)], Option[(String, Double)])]
    val deltaDf = deltas.toDF().toDF("id", "change", "old_val", "new_val")
      .selectExpr("id", "change",
        "if(old_val IS NULL, NULL, named_struct('grp', old_val._1, 'v', old_val._2)) AS old_val",
        "if(new_val IS NULL, NULL, named_struct('grp', new_val._1, 'v', new_val._2)) AS new_val")
    val a = snap(Seq((1L, "g1", 1.0), (2L, "g2", 2.0)))
    val view = Scd2.maintained(a, Seq("id"), baseVersion = 1L)
    val q = deltaDf.writeStream.outputMode("update").foreachBatch(view.sink).start()
    try {
      // batch 0 → version 2: change id 2, add id 3
      deltas.addData((2L, "changed", Some(("g2", 2.0)), Some(("g2", 5.0))),
        (3L, "added", None, Some(("g3", 3.0))))
      q.processAllAvailable()
      // batch 1 → version 3: remove id 1
      deltas.addData((1L, "removed", Some(("g1", 1.0)), None))
      q.processAllAvailable()
      val h = view.current
      assert(canon(Scd2.asOf(h, 1L)) == canon(a))
      assert(canon(Scd2.asOf(h, 2L)) ==
        Set((1L, "g1", 1.0), (2L, "g2", 5.0), (3L, "g3", 3.0)))
      assert(canon(Scd2.asOf(h, 3L)) == Set((2L, "g2", 5.0), (3L, "g3", 3.0)))
      // the batch fold over the same deltas yields the identical history
      assert(h.filter(col("valid_to").isNull).count() == 2)
    } finally q.stop()
  }

  test("randomized 4-snapshot chain: asOf reconstructs every snapshot (seeded)") {
    val rnd = new scala.util.Random(7)
    var cur = (0L until 120L).map(i =>
      (i, s"g${rnd.nextInt(5)}", math.rint(rnd.nextDouble() * 1e4) / 100))
    var nextId = 120L
    val snaps = Seq.newBuilder[(DataFrame, Long)]
    snaps += snap(cur) -> 1L
    (2L to 4L).foreach { v =>
      cur = cur.flatMap { case (id, g, x) =>
        rnd.nextInt(10) match {
          case 0 | 1 => None
          case 2 => Some((id, g, math.rint(x * 130) / 100))
          case 3 => Some((id, s"g${rnd.nextInt(5)}", x))
          case _ => Some((id, g, x))
        }
      } ++ (0 until 25).map { _ =>
        nextId += 1
        (nextId, s"g${rnd.nextInt(5)}", math.rint(rnd.nextDouble() * 1e4) / 100)
      }
      snaps += snap(cur) -> v
    }
    val all = snaps.result()
    val h = chain(all).cache()
    all.foreach { case (s, v) => assert(canon(Scd2.asOf(h, v)) == canon(s)) }
    // global invariant: never two open rows for one key
    assert(h.filter(col("valid_to").isNull)
      .groupBy("id").count().filter(col("count") > 1).count() == 0)
  }
}
