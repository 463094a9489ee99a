package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed tables make key-joins shuffle-free: the physical plan of a
  * join between two tables bucketed on the key contains NO exchange.
  */
class BucketingSpec extends SparkSpec {

  // At fact×fact scale broadcast is off the table; emulate by disabling
  // auto-broadcast so the planner must choose between shuffled and
  // bucketed sort-merge join.
  private def withoutBroadcast[T](body: => T): T = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("join of two bucketed tables plans without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.saveBucketed(
      graft.model.Tables(spark, sf, "orders"), "b_orders", "o_custkey", 4)
    Bucketing.saveBucketed(
      graft.model.Tables(spark, sf, "customer")
        .withColumnRenamed("c_custkey", "o_custkey"), "b_customer", "o_custkey", 4)

    withoutBroadcast {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      assert(joined.count() == 1500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free plan, got:\n$plan")

      // the unbucketed equivalent DOES shuffle — proves the assertion bites
      val unbucketed = graft.model.Tables(spark, sf, "orders")
        .join(graft.model.Tables(spark, sf, "customer")
          .withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
      unbucketed.count()
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange"))
    }
  }

  test("aggregation on the bucket key is also shuffle-free") {
    withoutBroadcast {
      val agg = spark.table("b_orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      agg.count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free agg, got:\n$plan")
    }
  }
}
