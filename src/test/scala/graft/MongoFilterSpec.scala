package graft

import org.apache.spark.sql.functions.col
import graft.ops.MongoFilter

/** Mongo filter-document surface (FIXTURES.md §C fixture 8;
  * mongraph.py:215-226).
  */
class MongoFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "domain", "evil.example", 0.9, Map("country" -> "VN")),
    (2L, "domain", "good.example", 0.0, Map("country" -> "US")),
    (3L, "ip", "10.1.2.3", 0.5, Map.empty[String, String]),
    (4L, "malicious", "h1", 1.0, Map("k" -> "v")),
    (5L, "legitimate", "h2", 0.0, Map.empty[String, String])
  ).toDF("id", "label", "name", "detected_prop", "props")

  private def ids(json: String): Seq[Long] =
    MongoFilter.where(df, json).orderBy("id").select("id").as[Long].collect().toSeq

  test("bare equality") {
    assert(ids("""{"name": "evil.example"}""") == Seq(1L))
  }

  test("implicit AND of multiple fields") {
    assert(ids("""{"label": "domain", "detected_prop": 0.0}""") == Seq(2L))
  }

  test("$or of documents (mongraph.py:236-241 shape)") {
    assert(ids("""{"$or": [{"label": "ip"}, {"label": "malicious"}]}""") == Seq(3L, 4L))
  }

  test("comparison operators $gt/$lt/$gte") {
    assert(ids("""{"detected_prop": {"$gt": 0.5}}""") == Seq(1L, 4L))
    assert(ids("""{"detected_prop": {"$gte": 0.5, "$lt": 1.0}}""") == Seq(1L, 3L))
  }

  test("$in / $nin") {
    assert(ids("""{"label": {"$in": ["ip", "legitimate"]}}""") == Seq(3L, 5L))
    assert(ids("""{"label": {"$nin": ["domain", "ip", "malicious"]}}""") == Seq(5L))
  }

  test("$regex has find-anywhere semantics like Mongo") {
    assert(ids("""{"name": {"$regex": "example"}}""") == Seq(1L, 2L))
    assert(ids("""{"name": {"$regex": "^h\\d$"}}""") == Seq(4L, 5L))
  }

  test("$not negates an operator document") {
    assert(ids("""{"detected_prop": {"$not": {"$gt": 0.0}}}""") == Seq(2L, 5L))
  }

  test("$nor") {
    assert(ids("""{"$nor": [{"label": "domain"}, {"label": "ip"}]}""") == Seq(4L, 5L))
  }

  test("dotted path resolves into the props map (schemaless attrs)") {
    assert(ids("""{"props.country": "VN"}""") == Seq(1L))
    assert(ids("""{"props.country": {"$exists": true}}""") == Seq(1L, 2L))
    assert(ids("""{"props.country": {"$exists": false}}""") == Seq(3L, 4L, 5L))
  }

  test("$mod on numeric fields") {
    assert(ids("""{"id": {"$mod": [2, 0]}}""") == Seq(2L, 4L))
  }

  // array operators run against a frame with an array column
  private lazy val arr = Seq(
    (1L, Seq("phish", "malware")),
    (2L, Seq("malware")),
    (3L, Seq.empty[String])
  ).toDF("id", "categories")

  private def arrIds(json: String): Seq[Long] =
    MongoFilter.where(arr, json).orderBy("id").select("id").as[Long].collect().toSeq

  test("$size / $all / $elemMatch over array attributes") {
    assert(arrIds("""{"categories": {"$size": 2}}""") == Seq(1L))
    assert(arrIds("""{"categories": {"$all": ["malware"]}}""") == Seq(1L, 2L))
    assert(arrIds("""{"categories": {"$all": ["malware", "phish"]}}""") == Seq(1L))
    assert(arrIds("""{"categories": {"$elemMatch": {"$regex": "^ph"}}}""") == Seq(1L))
  }

  test("$mod with a zero divisor fails at compile time, like Mongo's error") {
    val e = intercept[IllegalArgumentException] {
      MongoFilter.where(df, """{"id": {"$mod": [0, 0]}}""")
    }
    assert(e.getMessage.contains("divisor"))
    // fractional divisor truncating to zero is caught too
    intercept[IllegalArgumentException] {
      MongoFilter.where(df, """{"id": {"$mod": [0.5, 0]}}""")
    }
    // wrong arity is a clean error, not a MatchError
    val a = intercept[IllegalArgumentException] {
      MongoFilter.where(df, """{"id": {"$mod": [4]}}""")
    }
    assert(a.getMessage.contains("exactly"))
  }

  // $elemMatch field-document form runs against struct-array elements
  private lazy val structArr = Seq(
    (1L, Seq((8L, true), (2L, false))),
    (2L, Seq((9L, false))),
    (3L, Seq.empty[(Long, Boolean)])
  ).toDF("id", "hits")
    .withColumn("hits", col("hits").cast("array<struct<score:bigint,ok:boolean>>"))

  test("$elemMatch field-document form (Mongo's {field: pred} body) over struct arrays") {
    def sIds(json: String): Seq[Long] =
      MongoFilter.where(structArr, json).orderBy("id").select("id").as[Long].collect().toSeq
    // operator predicate on a field of the element
    assert(sIds("""{"hits": {"$elemMatch": {"score": {"$gt": 5}, "ok": true}}}""") == Seq(1L))
    // bare field equality inside the body
    assert(sIds("""{"hits": {"$elemMatch": {"score": 9}}}""") == Seq(2L))
  }

  // ---- promoted typed hot attributes (SURVEY §1.2) -----------------------
  import graft.model.PropertyGraph
  import graft.sources.GraphSnapshots

  private def mkGraph() = PropertyGraph.empty(spark).insertVertices(Seq(
    ("domain", "evil.example", Map("name" -> "evil.example", "detected_prop" -> "0.9")),
    ("domain", "good.example", Map("name" -> "good.example", "detected_prop" -> "0.0"))
  ).toDF("label", "key", "props"))

  test("promoted hot attribute: search_vertex equality compiles to a pushed-down parquet filter") {
    val g = mkGraph().promote("name" -> "string", "detected_prop" -> "double")
    val dir = java.nio.file.Files.createTempDirectory("graft-promo").toString
    GraphSnapshots.save(g, dir)
    val loaded = GraphSnapshots.load(spark, dir)
    val q = loaded.searchVertices(
      """{"name": "evil.example", "detected_prop": {"$gt": 0.5}}""")
    assert(q.count() == 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(name,evil.example)"),
      s"promoted attr must reach the scan as a pushed filter:\n$plan")
  }

  test("unpromoted attributes fall back to the schemaless props map probe") {
    assert(mkGraph().searchVertices("""{"name": "evil.example"}""").count() == 1)
    assert(mkGraph().searchVertices("""{"name": "nope"}""").count() == 0)
  }

  test("promoted columns re-derive from props after update_vertex, never drift") {
    val g = mkGraph().promote("name" -> "string")
    val id = g.searchVertices("""{"key": "evil.example"}""")
      .select("id").as[Long].head()
    val patched = g.updateVertices(
      Seq((id, Map("name" -> "renamed.example"))).toDF("id", "props"))
    val row = patched.vertices.filter(col("id") === id)
      .select("name", "props.name").as[(String, String)].head()
    assert(row == ("renamed.example", "renamed.example"))
  }
}
