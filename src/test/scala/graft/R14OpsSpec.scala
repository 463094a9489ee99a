package graft

import org.apache.spark.sql.functions._
import graft.ops.Windows

/** Round-14 operator changes: the fused two-level prefix sum+max helper
  * (single-exchange replacement for the chained ts_max_drawdown form) and
  * the non-null order-key precondition on the range-bucket helpers.
  */
class R14OpsSpec extends SparkSpec {
  import spark.implicits._

  // a sign-mixed series with a non-monotone running sum — the shape that
  // distinguishes a true per-bucket re-aggregate from "last running value"
  // shortcuts, across bucket boundaries
  private def series(n: Int, seed: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    // keys deliberately sparse + shuffled input order: bucketing must not
    // assume dense or sorted keys
    rnd.shuffle((0 until n).map(i => (i.toLong * 7 + (i % 3), // distinct
      (rnd.nextInt(2001) - 1000).toLong)).toList)
  }

  test("twoLevelPrefixSumMax == chained twoLevelPrefixSum + twoLevelPrefixMax, tiny bucket count forcing many buckets") {
    val df = series(500, 1).toDF("k", "v")
    val chained = Windows.twoLevelPrefixMax(
      Windows.twoLevelPrefixSum(df, "k", "v", "cum", buckets = 16),
      "k", "cum", "peak", buckets = 16)
      .select("k", "v", "cum", "peak")
    val fused = Windows.twoLevelPrefixSumMax(df, "k", "v", "cum", "peak",
      buckets = 16)
      .select("k", "v", "cum", "peak")
    assert(fused.collect().toSet == chained.collect().toSet)
  }

  test("twoLevelPrefixSumMax matches the single-window reference on a sign-mixed series") {
    val df = series(300, 2).toDF("k", "v")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("k").rowsBetween(Long.MinValue, 0)
    val ref = df.withColumn("cum", sum(col("v")).over(w))
      .withColumn("peak", max(col("cum")).over(w))
      .select("k", "cum", "peak").as[(Long, Long, Long)].collect().toSet
    val got = Windows.twoLevelPrefixSumMax(df, "k", "v", "cum", "peak",
      buckets = 8)
      .select("k", "cum", "peak").as[(Long, Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("twoLevelPrefixSumMax: single row, and all-negative values (peak = first prefix)") {
    val one = Seq((5L, -3L)).toDF("k", "v")
    val r1 = Windows.twoLevelPrefixSumMax(one, "k", "v", "cum", "peak")
      .select("cum", "peak").as[(Long, Long)].head()
    assert(r1 == ((-3L, -3L)))
    val neg = (1 to 50).map(i => (i.toLong, -i.toLong)).toDF("k", "v")
    val rows = Windows.twoLevelPrefixSumMax(neg, "k", "v", "cum", "peak",
      buckets = 4)
      .orderBy("k").select("k", "cum", "peak").as[(Long, Long, Long)].collect()
    rows.foreach { case (k, cum, peak) =>
      assert(cum == -k * (k + 1) / 2)
      assert(peak == -1L, s"k=$k: running peak of a strictly falling sum is the first prefix")
    }
  }

  test("two-level prefix helpers raise on NULL order keys instead of silently dropping the row") {
    val df = Seq((Some(1L), 10L), (None, 20L), (Some(3L), 30L))
      .toDF("k", "v")
    val ex = intercept[Exception] {
      Windows.twoLevelPrefixSum(df, "k", "v", "cum").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("NULL order key")),
      s"expected the precondition message, got: ${ex.getMessage}")
  }

  test("stratifiedRowNumber == plain stratum-partitioned row_number, tiny buckets forcing multi-bucket strata") {
    val rnd = new scala.util.Random(7)
    // sparse, shuffled ids across 4 strata of uneven sizes
    val rows = rnd.shuffle((0 until 400).map(i =>
      (s"lang${i % 7 % 4}", i.toLong * 13 + (i % 5))).toList)
    val df = rows.toDF("lang", "doc_id")
    val ref = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy("doc_id"))
        .cast("long"))
      .select("lang", "doc_id", "rn").as[(String, Long, Long)].collect().toSet
    val got = graft.ops.llm.Shuffle.stratifiedRowNumber(df, "lang", "doc_id",
        buckets = 8)
      .select("lang", "doc_id", "rn").as[(String, Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("ts_max_drawdown still matches its pre-fusion plan's values") {
    // the fused helper serves the declared query; re-derive the old
    // chained-helper result on the same input and compare the final row
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$dir/orders.parquet").exists())
    val got = Queries.all("ts_max_drawdown").fn(spark, dir).collect()
    assert(got.length == 1)
    import org.apache.spark.sql.types.DecimalType
    val daily = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
        .cast("long").as("cents"))
    val tot = daily.agg(sum(col("cents")).as("total"), count(lit(1)).as("n_days"))
    val dev = daily.crossJoin(broadcast(tot))
      .withColumn("dev_units", col("cents") * col("n_days") - col("total"))
      .withColumn("__ud", expr("CAST(unix_date(day) AS BIGINT)"))
    val old = Windows.twoLevelPrefixMax(
      Windows.twoLevelPrefixSum(dev, "__ud", "dev_units", "cum"),
      "__ud", "cum", "peak")
      .withColumn("dd_units", col("peak") - col("cum"))
      .orderBy(col("dd_units").desc, col("day")).limit(1)
      .select(col("day").as("trough_day"), col("n_days"), col("dd_units"),
        round(col("dd_units").cast("double") /
          (lit(100.0) * col("n_days").cast("double")), 2).as("drawdown"))
      .collect()
    assert(got.toSeq == old.toSeq)
  }
}
