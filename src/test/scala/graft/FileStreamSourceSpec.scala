package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Windows

/** End-to-end Structured Streaming over a REAL file source (VERDICT r11
  * ask #7): the streaming twins elsewhere are proven over MemoryStream;
  * this suite runs them through an actual `spark.readStream.parquet`
  * FileStreamSource — files discovered from a watched directory, one
  * file per micro-batch (`maxFilesPerTrigger=1`, oldest-first by
  * modification time), a real event-time watermark — and asserts the
  * stream's answer equals the batch transform over the same rows.
  *
  * This is the deployment shape: at 100 TB the ingest side is a landing
  * directory (or its cloud-storage equivalent) that micro-batches drain,
  * not an in-memory queue; the suite proves the transforms are
  * source-agnostic and the watermark semantics survive the file path.
  */
class FileStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Write `chunks` into `dir` as one parquet part-file each, with
    * strictly increasing modification times so the FileStreamSource's
    * oldest-first ordering replays them as the intended micro-batch
    * sequence.
    */
  private def writeChunks(dir: java.io.File, chunks: Seq[DataFrame]): Unit = {
    val base = System.currentTimeMillis() - 3600000L
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val stage = java.nio.file.Files.createTempDirectory(s"graft-chunk$i").toFile
      chunk.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(dir, f"chunk-$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(base + i * 60000L))
    }
  }

  test("file-source streamingTumbling over real events equals the batch answer") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/events.parquet").exists())
    val evFull = graft.model.Tables(spark, sf, "events")
      .select("event_id", "ts", "event_type", "value").localCheckpoint()
    val ev = evFull.drop("event_id")
    // three files split by event time — the landing-directory shape.
    // The split rank orders by (ts, event_id): a TOTAL order, so the three
    // lazy chunk filters (each a fresh evaluation of this plan) partition
    // the rows exactly — duplicate-ts rows under a ts-only order could
    // land in two chunks or none across recomputations.
    val ranked = evFull.withColumn("__rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    val n = ranked.count()
    val chunks = Seq(
      ranked.filter(col("__rn") <= n / 3),
      ranked.filter(col("__rn") > n / 3 && col("__rn") <= 2 * n / 3),
      ranked.filter(col("__rn") > 2 * n / 3)).map(_.drop("__rn", "event_id"))
    val watch = java.nio.file.Files.createTempDirectory("graft-fss-ev").toFile
    writeChunks(watch, chunks)

    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    val q = Windows.streamingTumbling(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("fss_tumbling").start()
    try {
      q.processAllAvailable()
      // one batch per file actually ran (not one catch-all batch)
      assert(q.recentProgress.count(_.numInputRows > 0) == 3,
        q.recentProgress.map(_.numInputRows).mkString(","))
      val streamed = spark.table("fss_tumbling")
        .orderBy("bucket", "event_type").collect().toSeq
      val batch = Windows.tumbling(ev)
        .orderBy("bucket", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("file-source streamingSessions: watermark finalizes a session across file batches") {
    // file 1: user 1's two-event session (closes at 00:40)
    // file 2: user 2 at 02:00 → watermark 01:50 > 00:40 → session emitted
    val f1 = Seq((ts("2024-01-01 00:00:00"), 1L, 1.0),
      (ts("2024-01-01 00:10:00"), 1L, 1.0)).toDF("ts", "user_id", "value")
    val f2 = Seq((ts("2024-01-01 02:00:00"), 2L, 1.0)).toDF("ts", "user_id", "value")
    val watch = java.nio.file.Files.createTempDirectory("graft-fss-sess").toFile
    writeChunks(watch, Seq(f1, f2))

    val stream = spark.readStream
      .schema(f1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    val q = Windows.streamingSessions(stream, gap = "30 minutes", watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("fss_sessions").start()
    try {
      q.processAllAvailable()
      val out = spark.table("fss_sessions")
        .select("user_id", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // user 1's merged 2-event session is final; user 2's is still open
      assert(out == Seq((1L, 2L)), out.toString)
      // the emission was watermark-driven: the engine reported a non-zero
      // event-time watermark once file 2's batch ran
      assert(q.recentProgress.exists(p =>
        Option(p.eventTime.get("watermark")).exists(_ > "2024-01-01T00:40:00")),
        q.recentProgress.map(_.eventTime).mkString("\n"))
    } finally q.stop()
  }

  test("file-source SlidingHllView: per-file batches fold the sketch; watermark finalizes windows") {
    // stateful SKETCH twin through the real file path (VERDICT r12 #6):
    // file 1 carries hours 0-2, file 2 (landing LATER in the watched dir)
    // carries hour 6 — its batch advances the watermark past hours 1-2,
    // so their windows become FINAL only once that batch runs.
    def ev(h: Int, users: Range) = users.map(u =>
      (h * 1000L + u, new Timestamp(ts("2024-01-01 00:00:00").getTime + h * 3600000L),
        u.toLong, "click", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val f1 = ev(0, 1 to 20).unionAll(ev(1, 1 to 30)).unionAll(ev(2, 1 to 10))
    val f2 = ev(6, 1 to 5)
    val t0h = ts("2024-01-01 00:00:00").getTime / 3600000L // unix hour
    val delayUs = 30L * 60 * 1000000
    val watch = java.nio.file.Files.createTempDirectory("graft-fss-hll").toFile
    writeChunks(watch, Seq(f1))

    val view = new graft.ops.SlidingHllView(spark)
    val stream = spark.readStream
      .schema(f1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    val q = stream.writeStream.foreachBatch(view.sink _).start()
    try {
      q.processAllAvailable()
      // watermark = hour-2 max event − 30 min → only hour 0's window final
      def finals() = view.finalizedWindows(delayUs)
        .select("w_end").collect().map(_.getLong(0)).toSet
      assert(finals() == Set(t0h))
      // the second file ARRIVES in the watched dir after the query started
      // — the landing-directory shape — and runs as its own micro-batch
      val stage = java.nio.file.Files.createTempDirectory("graft-hll-f2").toFile
      f2.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(watch, "chunk-001.parquet").toPath)
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) == 2,
        q.recentProgress.map(_.numInputRows).mkString(","))
      // watermark-driven emission: hour 6's batch finalized hours 1-2;
      // hour 6's own window stays open (monotone, exactly-once entry)
      assert(finals() == Set(t0h, t0h + 1, t0h + 2))
      // parity: the folded view equals the batch sketch pipeline over the
      // union of both files (the HllStreamSpec contract, via the file path)
      val dir = java.nio.file.Files.createTempDirectory("graft-hll-batch").toString
      f1.unionAll(f2).withColumn("props", lit("{}"))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val batch = Queries.all("sketch_hll_sliding").fn(spark, dir)
        .select("w_end", "v_zero", "z_scaled", "est_hll")
        .collect().map(_.toSeq).toSet
      val streamed = view.windows
        .select("w_end", "v_zero", "z_scaled", "est_hll")
        .collect().map(_.toSeq).toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("file-source NearDedupView: per-file batches maintain the bucket index; late file flips the rep") {
    // the other stateful twin VERDICT r12 #6 named, through the real file
    // path: file 1 carries an exact-dup pair (11, 21) → 11 is survivor;
    // file 2 lands LATER with the same text under the SMALLER id 1, which
    // must steal the representative role — the cross-batch state semantics
    // MemoryStream proved (NearDedupStreamSpec), now over FileStreamSource.
    val text = "the quick brown fox jumps over the lazy dog again and again today"
    val uniq = "completely unrelated first document about graph analytics at scale"
    val f1 = Seq((11L, text), (21L, text)).toDF("doc_id", "text")
    val f2 = Seq((1L, text), (3L, uniq)).toDF("doc_id", "text")
    val watch = java.nio.file.Files.createTempDirectory("graft-fss-nd").toFile
    writeChunks(watch, Seq(f1, f2))

    val view = new graft.ops.llm.NearDedupView(spark)
    val stream = spark.readStream
      .schema(f1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(watch.toString)
    val q = stream.writeStream.foreachBatch(view.sink _).start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.count(_.numInputRows > 0) == 2,
        q.recentProgress.map(_.numInputRows).mkString(","))
      val v = view.verdicts.select("doc_id", "cluster_rep", "kept")
        .as[(Long, Long, Boolean)].collect().toSet
      val batch = graft.ops.llm.Dedup.verifiedClusters(f1.unionAll(f2))
        .select("doc_id", "cluster_rep", "kept")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(v == batch)
      // the late smaller id took the rep; the file-1 survivor was demoted
      assert(v.contains((1L, 1L, true)) && v.contains((11L, 1L, false)))
      // the unique doc never enters the pair graph
      assert(!v.exists(_._1 == 3L))
    } finally q.stop()
  }
}
