package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Replayable HLL: the estimate must land within the sketch's standard
  * error of the exact cardinality, registers must be duplicate-blind and
  * mergeable-shaped, and the whole thing layout-invariant.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within ~3 standard errors of exact cardinality (m=256 → 6.5% se)") {
    for (n <- Seq(2000L, 20000L)) {
      val df = spark.range(n).select(lit("g").as("grp"), (col("id") * 7919L + 13L).as("k"))
      val est = Sketches.hllReplayable(df, "grp", "k")
        .select("est_hll").as[Double].head()
      assert(math.abs(est - n) / n < 0.2, s"n=$n est=$est")
    }
  }

  test("duplicate-blind: repeating every key 5x changes nothing") {
    val base = spark.range(5000).select(lit("g").as("grp"), col("id").as("k"))
    val dup = base.union(base).union(base).union(base).union(base)
    val a = Sketches.hllReplayable(base, "grp", "k").collect().toSeq
    val b = Sketches.hllReplayable(dup, "grp", "k").collect().toSeq
    assert(a == b)
  }

  test("layout-invariant and grouped: per-group registers are independent") {
    val df = spark.range(12000)
      .select((col("id") % 3).cast("string").as("grp"), col("id").as("k"))
    val a = Sketches.hllReplayable(df, "grp", "k").orderBy("grp").collect().toSeq
    val b = Sketches.hllReplayable(df.repartition(17), "grp", "k")
      .orderBy("grp").collect().toSeq
    assert(a == b)
    // 3 groups of ~4000 distinct keys each
    a.foreach { r =>
      val est = r.getDouble(3)
      assert(math.abs(est - 4000.0) / 4000.0 < 0.25, s"group ${r.getString(0)}: $est")
    }
  }

  test("z_scaled stays far inside exact BIGINT range (no silent precision loss)") {
    val df = spark.range(100000).select(lit("g").as("grp"), col("id").as("k"))
    val z = Sketches.hllReplayable(df, "grp", "k").select("z_scaled").as[Long].head()
    assert(z > 0 && z <= 256L * (1L << 31), s"z=$z out of the provable bound")
  }

  // ---- Count-Min sketch ----

  /** Zipf-ish occurrence stream: key k appears ~30000/(k+1) times — a few
    * genuine heavy hitters over a long tail, the CMS target workload.
    */
  private def zipfStream = spark.range(300)
    .select(col("id").as("key"), (lit(30000L) / (col("id") + 1)).cast("long").as("w"))
    .select(col("key"), explode(expr("sequence(1, w)")).as("__i"))
    .select((col("key") * 2654435761L % 1000000007L).as("h"), col("key"))

  test("CMS never undercounts, and heavy-hitter estimates are tight") {
    val occ = zipfStream.cache()
    val sketch = Sketches.cmsSketch(occ, "h")
    val exact = occ.groupBy("key", "h").agg(count(lit(1)).as("exact"))
    val est = Sketches.cmsEstimate(exact, sketch, "h")
      .select("key", "exact", "est_cnt")
      .as[(Long, Long, Long)].collect().toSeq
    assert(est.nonEmpty)
    // one-sided error: est >= exact for EVERY key — the CMS guarantee
    est.foreach { case (k, ex, e) => assert(e >= ex, s"key $k undercounted: $e < $ex") }
    // overcount bounded by ~e/w of the stream total (generous 3x slack)
    val total = est.map(_._2).sum
    val bound = 3.0 * math.E / Sketches.CmsWidth * total
    est.foreach { case (k, ex, e) =>
      assert(e - ex <= bound, s"key $k overcount ${e - ex} > bound $bound") }
  }

  test("CMS is layout-invariant and merges by elementwise sum") {
    val occ = zipfStream.cache()
    val whole = Sketches.cmsSketch(occ, "h").orderBy("j", "bucket").collect().toSeq
    val shuffled = Sketches.cmsSketch(occ.repartition(17), "h")
      .orderBy("j", "bucket").collect().toSeq
    assert(whole == shuffled)
    // sketch(A) + sketch(B) summed per counter == sketch(A union B)
    val a = occ.filter(col("key") % 2 === 0)
    val b = occ.filter(col("key") % 2 =!= 0)
    val merged = Sketches.cmsSketch(a, "h").unionAll(Sketches.cmsSketch(b, "h"))
      .groupBy("j", "bucket").agg(sum("cnt").as("cnt"))
      .orderBy("j", "bucket").collect().toSeq
    assert(merged == whole)
  }

  test("streaming: micro-batch-folded CMS equals the batch sketch over all data") {
    implicit val ctx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val occ = stream.toDF().toDF("h")
    val cms = Sketches.maintainedCms("h")
    val q = occ.writeStream.outputMode("append").foreachBatch(cms.sink).start()
    try {
      val batch1 = (0L until 400L).map(i => i % 37 * 104729L % 1000003L)
      val batch2 = (0L until 300L).map(i => i % 11 * 15485863L % 1000003L)
      stream.addData(batch1: _*)
      q.processAllAvailable()
      stream.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = cms.current.get.orderBy("j", "bucket").collect().toSeq
      val all = (batch1 ++ batch2).toDF("h")
      val batch = Sketches.cmsSketch(all, "h").orderBy("j", "bucket").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  // ---- histogram quantiles ----

  test("histogram quantile lands within one bin width of the exact quantile") {
    // two groups with different shapes: uniform-ish and heavy-tailed
    val df = spark.range(20000).select(
      (col("id") % 2).cast("string").as("g"),
      when(col("id") % 2 === 0, (col("id") % 997).cast("double"))
        .otherwise(((col("id") % 100) * (col("id") % 100)).cast("double"))
        .as("v"))
    val est = Sketches.histQuantile(df, "g", "v")
      .select("g", "p", "est_q").as[(String, Double, Double)].collect()
      .map { case (g, p, q) => (g, p) -> q }.toMap
    val rows = df.select("g", "v").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    for (g <- Seq("0", "1"); (nu, de) <- Seq((1, 4), (1, 2), (9, 10))) {
      val vs = rows(g)
      val width = (vs.last - vs.head) / Sketches.HistBins
      // the value at the sketch's rank target sits inside the chosen bin
      val target = (vs.length.toLong * nu + de - 1) / de
      val exactAtTarget = vs(target.toInt - 1)
      val e = est((g, nu.toDouble / de))
      assert(math.abs(e - exactAtTarget) <= width + 1e-9,
        s"g=$g p=$nu/$de est=$e exact=$exactAtTarget width=$width")
    }
  }

  test("histogram quantile excludes NULL values like the SQL side") {
    val df = spark.range(1000).select(
      lit("g").as("g"),
      when(col("id") % 3 === 0, lit(null).cast("double"))
        .otherwise((col("id") % 101).cast("double")).as("v"))
    val withNulls = Sketches.histQuantile(df, "g", "v").orderBy("p").collect().toSeq
    val prefiltered = Sketches.histQuantile(df.filter(col("v").isNotNull), "g", "v")
      .orderBy("p").collect().toSeq
    assert(withNulls == prefiltered && withNulls.size == 3)
  }

  test("histogram quantile is layout-invariant and handles constant groups") {
    val df = spark.range(5000).select(
      (col("id") % 3).cast("string").as("g"),
      when(col("id") % 3 === 2, lit(42.0))
        .otherwise((col("id") % 613).cast("double")).as("v"))
    val a = Sketches.histQuantile(df, "g", "v").orderBy("g", "p").collect().toSeq
    val b = Sketches.histQuantile(df.repartition(17), "g", "v")
      .orderBy("g", "p").collect().toSeq
    assert(a == b)
    // the all-constant group estimates the constant at every probe
    a.filter(_.getString(0) == "2").foreach(r => assert(r.getDouble(2) == 42.0))
  }

  test("CMS sketch size is bounded by d x w; unseen-key estimate stays near the noise floor") {
    val occ = zipfStream
    val sketch = Sketches.cmsSketch(occ, "h").cache()
    assert(sketch.count() <= Sketches.CmsDepth.toLong * Sketches.CmsWidth)
    val unseen = Seq((999999999L, "ghost")).toDF("h", "key")
    val est = Sketches.cmsEstimate(unseen, sketch, "h")
      .select("est_cnt").as[Long].head()
    // a fresh key CAN collide into nonzero buckets; with 4 independent
    // rows the min is almost surely small — assert the well-formed path
    // (no null, non-negative) and that it is far below the top hitter
    assert(est >= 0 && est < 1000)
  }
}
