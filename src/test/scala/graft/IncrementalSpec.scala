package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Incremental, SnapshotDiff}

/** Incremental view maintenance: mergeGroupAgg(groupAgg(A), diff(A, B))
  * must equal groupAgg(B) EXACTLY — adds, removes, in-place changes,
  * group migration, vanishing groups, and a seeded randomized sweep.
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: DataFrame): DataFrame = Incremental.groupAgg(df, "grp", "v")

  private def canon(df: DataFrame): Seq[(String, Long, Double)] =
    df.select(col("grp"), col("n"), col("s").cast("double"))
      .as[(String, Long, Double)].collect().toSeq.sorted

  private def maintained(a: DataFrame, b: DataFrame): DataFrame =
    Incremental.mergeGroupAgg(agg(a), SnapshotDiff.diff(a, b, Seq("id")), "grp", "v")

  test("maintained aggregate equals full recompute (add/remove/change/migrate)") {
    val a = Seq((1L, "g1", 1.5), (2L, "g1", 2.25), (3L, "g2", 10.0),
      (4L, "g2", 0.5), (5L, "g3", 7.0)).toDF("id", "grp", "v")
    val b = Seq(
      (1L, "g1", 1.5),   // unchanged — contributes nothing to the delta
      (2L, "g2", 2.25),  // group migration g1 → g2
      (3L, "g2", 11.0),  // in-place value change
      (5L, "g3", 7.0),   // unchanged; id 4 removed
      (6L, "g1", 3.0)    // added
    ).toDF("id", "grp", "v")
    assert(canon(maintained(a, b)) == canon(agg(b)))
    assert(canon(maintained(a, b)) ==
      Seq(("g1", 2L, 4.5), ("g2", 2L, 13.25), ("g3", 1L, 7.0)))
  }

  test("a group whose last row leaves vanishes from the maintained view") {
    val a = Seq((1L, "g1", 1.0), (2L, "g2", 2.0)).toDF("id", "grp", "v")
    val b = Seq((1L, "g1", 1.0)).toDF("id", "grp", "v")
    assert(canon(maintained(a, b)) == Seq(("g1", 1L, 1.0)))
  }

  test("a group whose remaining values are all NULL keeps a NULL sum (not 0)") {
    val a = Seq((1L, "g1", Some(1.5)), (2L, "g1", None), (3L, "g2", Some(2.0)))
      .toDF("id", "grp", "v")
    val b = Seq((2L, "g1", None: Option[Double]), (3L, "g2", Some(2.0)))
      .toDF("id", "grp", "v")
    def canonN(df: DataFrame): Seq[(String, Long, Option[Double])] =
      df.select(col("grp"), col("n"), col("s").cast("double"))
        .as[(String, Long, Option[Double])].collect().toSeq.sorted
    // full recompute's SUM over g1 is NULL (its only value is NULL); the
    // maintained view must agree — a signed-sum merge alone would say 0
    assert(canonN(maintained(a, b)) == Seq(("g1", 1L, None), ("g2", 1L, Some(2.0))))
    assert(canonN(maintained(a, b)) == canonN(agg(b)))
  }

  test("empty delta is the identity") {
    val a = Seq((1L, "g1", 1.25), (2L, "g2", 2.5)).toDF("id", "grp", "v")
    assert(canon(maintained(a, a)) == canon(agg(a)))
  }

  test("streaming: a delta stream folds into the view batch by batch") {
    implicit val ctx = spark.sqlContext
    // delta rows in SnapshotDiff shape: (id, change, old_val?, new_val?)
    // — Option[tuple] encodes the absent side as a NULL struct
    val deltas = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Option[(String, Double)], Option[(String, Double)])]
    val deltaDf = deltas.toDF().toDF("id", "change", "old_val", "new_val")
      .selectExpr("id", "change",
        "if(old_val IS NULL, NULL, named_struct('grp', old_val._1, 'v', old_val._2)) AS old_val",
        "if(new_val IS NULL, NULL, named_struct('grp', new_val._1, 'v', new_val._2)) AS new_val")
    val a = Seq((1L, "g1", 1.5), (2L, "g2", 2.0)).toDF("id", "grp", "v")
    val view = graft.ops.Incremental.maintained(agg(a), "grp", "v")
    val q = deltaDf.writeStream.outputMode("update")
      .foreachBatch(view.sink).start()
    try {
      // batch 1: add (3, g1, 3.0); change id 2's value
      deltas.addData((3L, "added", None, Some(("g1", 3.0))),
        (2L, "changed", Some(("g2", 2.0)), Some(("g2", 5.0))))
      q.processAllAvailable()
      assert(canon(view.current) == Seq(("g1", 2L, 4.5), ("g2", 1L, 5.0)))
      // batch 2: remove id 1; migrate id 2 to g1 — folds onto batch-1 state
      deltas.addData((1L, "removed", Some(("g1", 1.5)), None),
        (2L, "changed", Some(("g2", 5.0)), Some(("g1", 5.0))))
      q.processAllAvailable()
      assert(canon(view.current) == Seq(("g1", 2L, 8.0)))
      // equals the full recompute over the final snapshot
      val fin = Seq((2L, "g1", 5.0), (3L, "g1", 3.0)).toDF("id", "grp", "v")
      assert(canon(view.current) == canon(agg(fin)))
    } finally q.stop()
  }

  test("randomized snapshots: maintained == recomputed (seeded)") {
    val rnd = new scala.util.Random(42)
    val aRows = (0L until 200L).map(i =>
      (i, s"g${rnd.nextInt(6)}", math.rint(rnd.nextDouble() * 1e4) / 100))
    val bRows = aRows.flatMap { case (id, g, v) =>
      rnd.nextInt(10) match {
        case 0 | 1 => None                                        // removed
        case 2 => Some((id, g, math.rint(v * 170) / 100))         // changed
        case 3 => Some((id, s"g${rnd.nextInt(6)}", v))            // migrated
        case _ => Some((id, g, v))                                // unchanged
      }
    } ++ (200L until 260L).map(i =>
      (i, s"g${rnd.nextInt(6)}", math.rint(rnd.nextDouble() * 1e4) / 100))
    val a = aRows.toDF("id", "grp", "v")
    val b = bRows.toDF("id", "grp", "v")
    assert(canon(maintained(a, b)) == canon(agg(b)))
  }
}
