package graft

import org.apache.spark.sql.functions._
import graft.model.PropertyGraph
import graft.sources.GraphSnapshots

/** CSV/JSON snapshot sinks + the streaming vertex source. */
class SnapshotFormatsSpec extends SparkSpec {
  import spark.implicits._

  private def sample = PropertyGraph.empty(spark)
    .insertVertices(Seq(("domain", "a.example"), ("ip", "10.0.0.1")).toDF("label", "key"))

  test("json-lines export round-trips vertex content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    GraphSnapshots.saveJson(sample, dir)
    val back = spark.read.json(s"$dir/vertices")
    assert(back.count() == 2)
    assert(back.select("key").as[String].collect().toSet == Set("a.example", "10.0.0.1"))
  }

  test("csv export flattens props to JSON text") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val g = sample.updateVertices(
      sample.vertices.limit(1).select(col("id"), map(lit("k"), lit("v")).as("props")))
    GraphSnapshots.saveCsv(g, dir)
    val back = spark.read.option("header", "true").csv(s"$dir/vertices")
    assert(back.count() == 2)
    assert(back.filter(col("props").contains("\"k\":\"v\"")).count() == 1)
  }

  test("orc snapshot round-trips the graph like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orc").toString
    GraphSnapshots.saveOrc(sample, dir)
    val back = GraphSnapshots.loadOrc(spark, dir)
    assert(back.vertices.orderBy("id").collect().toSeq ==
      sample.vertices.orderBy("id").collect().toSeq)
    assert(back.edges.count() == sample.edges.count())
  }

  test("streaming vertex source consumes a snapshot directory incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    GraphSnapshots.save(sample, dir)
    val q = GraphSnapshots.streamVertices(spark, dir)
      .groupBy("label").count()
      .writeStream.outputMode("complete").format("memory").queryName("vstream").start()
    try {
      q.processAllAvailable()
      val counts = spark.table("vstream").as[(String, Long)].collect().toMap
      assert(counts == Map("domain" -> 1L, "ip" -> 1L))
    } finally q.stop()
  }

  test("streaming edge source mirrors streamVertices over the edges directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft-estream").toString
    val ids = sample.vertices.orderBy("key").select("id").as[Long].collect()
    val g = sample.insertEdges(
      Seq((ids(0), ids(1), "resolve")).toDF("src", "dst", "label"))
    GraphSnapshots.save(g, dir)
    val q = GraphSnapshots.streamEdges(spark, dir)
      .groupBy("label").count()
      .writeStream.outputMode("complete").format("memory").queryName("estream").start()
    try {
      q.processAllAvailable()
      val counts = spark.table("estream").as[(String, Long)].collect().toMap
      assert(counts == Map("resolve" -> 1L))
    } finally q.stop()
  }
}
