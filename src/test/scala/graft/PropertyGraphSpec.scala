package graft

import org.apache.spark.sql.functions._
import graft.model.PropertyGraph
import graft.sources.GraphSnapshots

/** End-to-end facade semantics: the MongoGraph surface on immutable
  * snapshots.
  */
class PropertyGraphSpec extends SparkSpec {
  import spark.implicits._

  private def g0 = PropertyGraph.empty(spark)
    .insertVertices(Seq(
      ("domain", "evil.example"), ("domain", "good.example"),
      ("ip", "10.1.2.3")).toDF("label", "key"))

  test("insertVertices is upsert-by-natural-key, first write wins") {
    val g1 = g0.insertVertices(Seq(("domain", "evil.example")).toDF("label", "key"))
    assert(g1.vertices.count() == 3)
    // same id for same (label, key) → idempotent
    val g2 = g1.insertVertices(Seq(("domain", "new.example")).toDF("label", "key"))
    assert(g2.vertices.count() == 4)
  }

  test("unregistered label raises (mongraph.py:81-82 contract)") {
    val bad = g0.insertVertices(Seq(("nonsense", "x")).toDF("label", "key"))
    intercept[Exception] { bad.vertices.count() }
  }

  test("within-batch key conflicts resolve by canonical props JSON, not partitioning") {
    // two rows with the same natural key but different props in ONE batch:
    // the survivor is the canonical-JSON minimum — identical on every run,
    // partitioning, and stage retry.
    val g1 = g0.insertVertices(Seq(
      ("domain", "dup.example", Map("country" -> "VN")),
      ("domain", "dup.example", Map("country" -> "AU"))
    ).toDF("label", "key", "props"))
    val props = g1.vertices.filter(col("key") === "dup.example")
      .select("props").as[Map[String, String]].head()
    assert(props == Map("country" -> "AU")) // "AU" < "VN" in the sorted-entry JSON
    // same rule on the edge side: (src,dst,label) conflict keeps min props
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g2 = g0.insertEdges(Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign", Map("date" -> "2024-12-31")),
      (ids("evil.example"), ids("10.1.2.3"), "assign", Map("date" -> "2016-01-01"))
    ).toDF("src", "dst", "label", "props"))
    val eprops = g2.edges.select("props").as[Map[String, String]].head()
    assert(eprops == Map("date" -> "2016-01-01"))
  }

  test("NULL props vs empty props get distinct tie-break keys (NULL wins, deterministically)") {
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val batch = Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign", Some(Map.empty[String, String])),
      (ids("evil.example"), ids("10.1.2.3"), "assign", None)
    ).toDF("src", "dst", "label", "props")
    val g2 = g0.insertEdges(batch)
    assert(g2.edges.count() == 1)
    // NULL orders before "[]" (Spark ASC nulls-first) → the NULL-props row
    // survives, identically on every partitioning.
    assert(g2.edges.select("props").head().isNullAt(0))
  }

  test("edges + neighbors + cascade delete round trip") {
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g1 = g0.insertEdges(Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign"),
      (ids("good.example"), ids("10.1.2.3"), "assign")).toDF("src", "dst", "label"))
    assert(g1.edges.count() == 2)
    // neighbors of the ip sees both domains + itself
    assert(g1.neighbors(ids("10.1.2.3")).count() == 3)
    // cascade delete the ip → both edges gone
    val g2 = g1.deleteVertices(Seq(ids("10.1.2.3")).toDF("id"))
    assert(g2.vertices.count() == 2 && g2.edges.count() == 0)
  }

  test("searchVertices with a Mongo filter document") {
    val hits = g0.searchVertices("""{"$or": [{"label": "ip"}, {"key": {"$regex": "^good"}}]}""")
    assert(hits.count() == 2)
  }

  test("deleteWhere: filter-resolved cascade delete; empty match deletes nothing (mongraph.py:164-171 intent)") {
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g1 = g0.insertEdges(Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign")).toDF("src", "dst", "label"))
    val g2 = g1.deleteWhere("""{"label": "ip"}""")
    assert(g2.vertices.count() == 2 && g2.edges.count() == 0) // cascade took the edge
    val g3 = g1.deleteWhere("""{"key": "no.such.vertex"}""")
    assert(g3.vertices.count() == 3 && g3.edges.count() == 1) // no crash, no-op
  }

  test("updateVertices patches props by id") {
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g1 = g0.updateVertices(Seq((ids("evil.example"), Map("score" -> "0.9")))
      .toDF("id", "props"))
    val props = g1.vertices.filter(col("id") === ids("evil.example"))
      .head().getMap[String, String](3)
    assert(props("score") == "0.9")
  }

  test("updateEdges patches edge props by exact (src,dst,label) (mongraph.py:205-213)") {
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g1 = g0.insertEdges(Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign"),
      (ids("good.example"), ids("10.1.2.3"), "assign")).toDF("src", "dst", "label"))
    val g2 = g1.updateEdges(Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign", Map("date" -> "2016-01-01")))
      .toDF("src", "dst", "label", "props"))
    val patched = g2.edges.filter(col("src") === ids("evil.example")).head()
    assert(patched.getMap[String, String](3)("date") == "2016-01-01")
    // the other edge keeps its original empty props
    val other = g2.edges.filter(col("src") === ids("good.example")).head()
    assert(other.getMap[String, String](3).isEmpty)
  }

  test("buildGraphJson emits the reference's graph document shape") {
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g1 = g0.insertEdges(Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign")).toDF("src", "dst", "label"))
    val json = g1.buildGraphJson(ids("evil.example"), depth = 1)
    assert(json.startsWith("""{"graph":{"vertices":["""))
    assert(json.contains("\"evil.example\"") && json.contains("\"10.1.2.3\""))
    assert(!json.contains("good.example")) // not reachable
  }

  test("edgeDetails: exact (src,dst,label) point lookup (mongraph.py:46-60)") {
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g1 = g0.insertEdges(Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign"),
      (ids("good.example"), ids("10.1.2.3"), "assign")).toDF("src", "dst", "label"))
    val hit = g1.edgeDetails(Seq((ids("evil.example"), ids("10.1.2.3"), "assign")))
    assert(hit.count() == 1)
    assert(g1.edgeDetails(Seq((ids("10.1.2.3"), ids("evil.example"), "assign"))).count() == 0)
  }

  test("insertConnected: new vertex becomes the edge source (mongraph.py:149-150)") {
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g1 = g0.insertConnected(
      Seq(("ip", "10.9.9.9")).toDF("label", "key"), ids("evil.example"), "assign")
    assert(g1.vertices.count() == 4)
    val e = g1.edges.head()
    assert(e.getLong(1) == ids("evil.example")) // destination is existing vertex
    assert(e.getString(2) == "assign")
    // edge source is the NEW vertex
    val newId = g1.vertices.filter(col("key") === "10.9.9.9").head().getLong(0)
    assert(e.getLong(0) == newId)
  }

  test("snapshot save/load round trip preserves the graph") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val ids = g0.vertices.select("key", "id").as[(String, Long)].collect().toMap
    val g1 = g0.insertEdges(Seq(
      (ids("evil.example"), ids("10.1.2.3"), "assign")).toDF("src", "dst", "label"))
    GraphSnapshots.save(g1, dir)
    val g2 = GraphSnapshots.load(spark, dir)
    assert(g2.vertices.count() == 3 && g2.edges.count() == 1)
    assert(g2.vertices.schema == g1.vertices.schema)
  }
}
