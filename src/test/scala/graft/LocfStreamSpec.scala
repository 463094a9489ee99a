package graft

import org.apache.spark.sql.functions._

/** Proves the LocfView streaming twin's parity contract: for time-ordered
  * batch splits, concatenated outputs equal the batch [[graft.ops.Windows.gapFill]]
  * over each prefix — including readings carried ACROSS batch boundaries.
  */
class LocfStreamSpec extends SparkSpec {
  import spark.implicits._

  test("LocfView per-prefix equality with batch gapFill on real events") {
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val ev = graft.model.Tables(spark, dir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .localCheckpoint()
    // 4 time-ordered batches: split at ts quartiles (strict boundaries so
    // every batch-k row orders after every batch-(k-1) row)
    val ranked = ev.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))))
    val n = ranked.count()
    val bounds = Seq(n / 4, n / 2, 3 * n / 4, n)
    val view = new graft.ops.Windows.LocfView(spark)
    var lo = 0L
    var accumulated: Option[org.apache.spark.sql.DataFrame] = None
    for (hi <- bounds) {
      val batch = ranked.filter(col("__rn") > lo && col("__rn") <= hi)
        .drop("__rn")
      val out = view.processBatch(batch)
      accumulated = Some(accumulated.map(_.unionByName(out)).getOrElse(out))
      // batch reference over the full prefix so far
      val prefix = ranked.filter(col("__rn") <= hi).drop("__rn")
      val expect = graft.ops.Windows.gapFill(prefix)
        .select("event_id", "filled")
      val got = accumulated.get.select("event_id", "filled")
      assert(got.count() == expect.count())
      val diff = got.join(expect.withColumnRenamed("filled", "__e"), "event_id")
        .filter(!(col("filled") <=> col("__e")))
      assert(diff.isEmpty, s"prefix rn<=$hi: ${diff.count()} mismatches")
      lo = hi
    }
    assert(view.stateSize > 0)
  }
}
