package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Enforced contract for unpartitioned (global) windows (VERDICT r11 #4):
  * a `WindowExec` with an empty partition spec serializes the whole input
  * through ONE task — acceptable only over frames that are bounded by
  * construction (bucket-count tables, top-k survivors, per-source stats
  * rows), never over row-scale data. This spec walks the physical plan of
  * every declared query and fails the build if a global window appears in
  * a query outside the audited allowlist below — a future op that sneaks
  * an unbounded global window in no longer compiles into a green build.
  */
class GlobalWindowContractSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Queries audited to hold global windows ONLY over bounded frames, with
    * the bound named. Adding a key here requires the same audit.
    */
  private val allowlisted: Map[String, String] = Map(
    "bm25_retrieval" -> "rank window only on the <=7-row TakeOrdered head-term frame",
    "bpe_merge_pairs" -> "rank window only on the k=20 TakeOrdered merge-candidate frame",
    "funnel_latency" -> "two-level prefix-sum offsets over the latency-bucket totals frame",
    "graph_eccentricity" -> "diameter window on the <=4-row per-landmark eccentricity frame",
    "ks_drift" -> "two-level prefix-sum offsets over the <=value-range-row bucket table",
    "mann_whitney" -> "midrank windows on the collapsed per-value count table (value-domain-bounded)",
    "pack_sequences" -> "two-level prefix-sum offsets over the range-bucket totals frame",
    "purchase_cadence" -> "CDF window on the gap-days histogram (day-domain-bounded)",
    "rfm_segment" -> "3x globalRowNumber bucket-offset frames (64 rows each)",
    "shuffle_deterministic" -> "two-level prefix-sum offsets over the 64-bucket totals frame",
    "skyline_pareto" -> "two-level prefix-sum offsets over the block totals frame",
    "split_holdout" -> "share window on the 3-row split summary",
    "text_search_bool" -> "rank window only on the <=9-row TakeOrdered term frame",
    "ts_changepoint" -> "two-level prefix-sum offsets over the <=1025-row bucket totals frame",
    "ts_max_drawdown" -> "two-level prefix-sum/max offsets over the <=1025-row bucket totals frames",
    "ts_seasonality" -> "total window on the <=24-row hour-of-day table",
    "ts_theil_sen" -> "two-level prefix-sum offsets over the bucket totals frame",
    "vocab_topk" -> "rank/coverage window only on the k=1000 TakeOrdered survivor frame",
    "watermark_audit" -> "two-level prefix-sum offsets over the bucket totals frame"
  )

  private def globalWindows(plan: SparkPlan): Seq[WindowExec] =
    plan.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }

  test("no query outside the audited allowlist plans a global window") {
    assume(new java.io.File(s"$dir/events.parquet").exists())
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val gw = globalWindows(fn(spark, dir).queryExecution.sparkPlan)
          if (gw.nonEmpty && !allowlisted.contains(name))
            Some(s"$name: ${gw.size} global WindowExec node(s)")
          else None
        } catch { case _: Throwable => None } // execution failures are InventorySmokeSpec's job
    }
    assert(offenders.isEmpty,
      "unaudited global (unpartitioned) windows — either repartition the window " +
        "or audit the bound and extend the allowlist:\n  " + offenders.mkString("\n  "))
  }

  test("allowlist entries still name real queries") {
    val stale = allowlisted.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"allowlisted keys no longer in the inventory: $stale")
  }

  test("detector catches a seeded unbounded global window") {
    val seeded: DataFrame = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(Window.orderBy("o_orderkey")))
    assert(globalWindows(seeded.queryExecution.sparkPlan).nonEmpty)
  }

  test("detector ignores properly partitioned windows") {
    val ok: DataFrame = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_orderstatus").orderBy("o_orderkey")))
    assert(globalWindows(ok.queryExecution.sparkPlan).isEmpty)
  }
}
