package graft

import graft.ops.AsOf

/** As-of join semantics: strictly-prior match, per-key isolation, null on
  * no-prior — hand-computed expectations.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val quotes = Seq(
    (1L, 10L, 100.0), (1L, 20L, 200.0), (3L, 5L, 999.0))
    .toDF("user_id", "ts", "value")

  private lazy val trades = Seq(
    (101L, 1L, 5L),  // before any quote → null
    (102L, 1L, 10L), // equal time → strictly-prior excludes the t=10 quote
    (103L, 1L, 15L), // → quote at 10
    (104L, 1L, 25L), // → quote at 20 (latest prior, not first)
    (105L, 2L, 50L)  // key with no quotes at all → null
  ).toDF("event_id", "user_id", "ts")

  test("as-of picks the latest strictly-prior right row per key") {
    val out = AsOf.joinStrictPrior(trades, quotes,
      keyCols = Seq("user_id"), timeCol = "ts", rightCols = Seq("ts", "value"))
      .select("event_id", "asof_ts", "asof_value")
      .orderBy("event_id")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    assert(out == Seq(
      (101L, None, None),
      (102L, None, None),
      (103L, Some(10L), Some(100.0)),
      (104L, Some(20L), Some(200.0)),
      (105L, None, None)))
  }

  test("left columns pass through unchanged and row count is preserved") {
    val out = AsOf.joinStrictPrior(trades, quotes,
      keyCols = Seq("user_id"), timeCol = "ts", rightCols = Seq("value"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("user_id", "ts", "event_id", "asof_value"))
  }

  test("tolerance bound: stale matches null as a UNIT (time and payload together)") {
    import org.apache.spark.sql.functions._
    val q = quotes.withColumn("ts", expr("timestamp_micros(ts)"))
    val t = trades.withColumn("ts", expr("timestamp_micros(ts)"))
    val out = AsOf.joinStrictPriorWithin(t, q,
      keyCols = Seq("user_id"), timeCol = "ts", rightCols = Seq("ts", "value"),
      toleranceMicros = 5L)
      .select(col("event_id"), unix_micros(col("asof_ts")).as("m"), col("asof_value"))
      .orderBy("event_id")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    assert(out == Seq(
      (101L, None, None),
      (102L, None, None),
      (103L, Some(10L), Some(100.0)), // 15-10=5 ≤ 5: within tolerance
      (104L, Some(20L), Some(200.0)), // 25-20=5 ≤ 5
      (105L, None, None)))
    val strict = AsOf.joinStrictPriorWithin(t, q,
      keyCols = Seq("user_id"), timeCol = "ts", rightCols = Seq("ts", "value"),
      toleranceMicros = 4L)
      .select(col("event_id"), unix_micros(col("asof_ts")).as("m"), col("asof_value"))
      .orderBy("event_id")
      .as[(Long, Option[Long], Option[Double])].collect().toSeq
    // one microsecond tighter: both matches age out, and BOTH carried
    // columns null together — a per-column staleness test that nulls the
    // time first would leave the value behind (the bug class the oracle
    // caught on first verify)
    assert(strict.forall { case (_, m, v) => m.isEmpty == v.isEmpty })
    assert(strict.count(_._2.isDefined) == 0)
  }

  test("as-of is a single-shuffle plan: exactly one exchange, no join operator") {
    val out = AsOf.joinStrictPrior(trades, quotes,
      keyCols = Seq("user_id"), timeCol = "ts", rightCols = Seq("value"))
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "(?i)\\bexchange\\b".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"no join operator expected, plan:\n$plan")
  }
}
