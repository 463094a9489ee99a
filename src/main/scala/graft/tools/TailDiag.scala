package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Qh.{dsum => qdsum}

/** Dev-only isolation harness for the r14 tail-probe superlinears: times
  * decomposed pieces of the flagged queries so the fix targets the
  * measured term. `runMain graft.tools.TailDiag <sfDir> [parts]`.
  */
object TailDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAXPART", "134217728"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String) = graft.model.Tables(spark, sfDir, n)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[diag] $label%-48s ${(System.nanoTime() - t0) / 1e9}%8.2f s (rows=$n)")
    }
    graft.model.Tables.warm(spark, sfDir)

    val o = t("orders")
    time("orders plain count")(o.count())
    time("orders filter %2=0 count")(o.filter(col("o_orderkey") % 2 === 0).count())
    time("orders 1-branch groupBy(prio) count+dsum") {
      o.filter(col("o_orderkey") % 2 === 1)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), qdsum(col("o_totalprice")).as("s")).count()
    }
    time("schema_evolution full (union+agg)") {
      graft.Queries.all("schema_evolution").fn(spark, sfDir).count()
    }
    time("union WITHOUT allowMissing (aligned cols)") {
      val v1 = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_custkey"), col("o_totalprice"),
          lit(null).cast("string").as("o_orderpriority"))
      val v2 = o.filter(col("o_orderkey") % 2 === 1)
        .select(lit(null).cast("bigint").as("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
      v1.unionByName(v2).groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), count(col("o_custkey")).as("nc"),
          qdsum(col("o_totalprice")).as("s")).count()
    }
    time("union + plain double sum (no dsum)") {
      val v1 = o.filter(col("o_orderkey") % 2 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val v2 = o.filter(col("o_orderkey") % 2 === 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), count(col("o_custkey")).as("nc"),
          sum(col("o_totalprice")).as("s")).count()
    }

    val ids = t("customer").filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("o_custkey"))
    time("ids side count")(ids.count())
    time("semi_join count (no sort)") {
      o.join(ids, Seq("o_custkey"), "left_semi").count()
    }
    time("semi_join_ids full (with orderBy)") {
      graft.Queries.all("semi_join_ids").fn(spark, sfDir).count()
    }
    time("anti_join_delete full") {
      graft.Queries.all("anti_join_delete").fn(spark, sfDir).count()
    }

    time("sketch_hll_replay full") {
      graft.Queries.all("sketch_hll_replay").fn(spark, sfDir).count()
    }
    time("retention_cohort full") {
      graft.Queries.all("retention_cohort").fn(spark, sfDir).count()
    }
    time("set_ops full") {
      graft.Queries.all("set_ops").fn(spark, sfDir).count()
    }
    time("sliding_window full") {
      graft.Queries.all("sliding_window").fn(spark, sfDir).count()
    }
    spark.stop()
  }
}
