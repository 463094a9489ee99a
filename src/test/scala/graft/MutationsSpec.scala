package graft

import org.apache.spark.sql.functions._
import graft.ops.Mutations

/** Reference-fidelity mutation semantics (FIXTURES.md §C fixtures 1-3). */
class MutationsSpec extends SparkSpec {
  import spark.implicits._

  test("upsert is first-write-wins on the natural key (mongraph.py:90-94)") {
    val existing = Seq((1L, "domain", "evil.example", "old-attr")).toDF("id", "label", "key", "attr")
    val incoming = Seq(
      (1L, "domain", "evil.example", "NEW-attr"), // conflict → discarded
      (2L, "domain", "other.example", "fresh")).toDF("id", "label", "key", "attr")
    val out = Mutations.upsert(existing, incoming, Seq("id")).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getString(3) == "old-attr") // existing wins
    assert(out(1).getString(3) == "fresh")    // new key appended
  }

  test("upsert twice is idempotent (insert twice ≡ once)") {
    val existing = Seq((1L, "a")).toDF("id", "v")
    val incoming = Seq((1L, "b"), (2L, "c")).toDF("id", "v")
    val once = Mutations.upsert(existing, incoming, Seq("id"))
    val twice = Mutations.upsert(once, incoming, Seq("id"))
    assert(once.orderBy("id").collect().toSeq == twice.orderBy("id").collect().toSeq)
  }

  test("edge dedup key is (src,dst,label): direction-sensitive, A→B twice collapses (mongraph.py:120-127)") {
    val existing = Seq((1L, 2L, "resolve", "p0")).toDF("src", "dst", "label", "p")
    val incoming = Seq(
      (1L, 2L, "resolve", "p1"), // exact dup → dropped, existing wins
      (2L, 1L, "resolve", "p2"), // reverse direction → kept
      (1L, 2L, "observed", "p3") // other label → kept
    ).toDF("src", "dst", "label", "p")
    val out = Mutations.upsertEdges(existing, incoming).orderBy("src", "dst", "label").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq ==
      Seq((1L, 2L, "observed", "p3"), (1L, 2L, "resolve", "p0"), (2L, 1L, "resolve", "p2")))
  }

  test("cascade delete removes vertex and ALL incident edges, both directions (mongraph.py:171-177)") {
    // star around X(=1): FIXTURES.md §C fixture 3
    val v = Seq((1L, "X"), (2L, "A"), (3L, "B"), (4L, "C")).toDF("id", "name")
    val e = Seq((1L, 2L, "e"), (3L, 1L, "e"), (1L, 4L, "e")).toDF("src", "dst", "label")
    val (v2, e2) = Mutations.deleteVerticesCascade(v, e, Seq(1L).toDF("id"))
    assert(v2.count() == 3 && e2.count() == 0)
  }

  test("patch: coalesce(new, old) per column, others preserved (mongraph.py:195-203)") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "score")
    val patches = Seq((2L, 99.0)).toDF("id", "score")
    val out = Mutations.patch(target, patches, Seq("id")).orderBy("id").collect()
    assert(out(0).getDouble(2) == 10.0 && out(1).getDouble(2) == 99.0)
    assert(out(1).getString(1) == "b")
  }

  test("patch with duplicate patch keys does not multiply target rows") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "score")
    val patches = Seq((2L, 99.0), (2L, 77.0)).toDF("id", "score")
    val out = Mutations.patch(target, patches, Seq("id")).orderBy("id").collect()
    assert(out.length == 2)                   // key-uniqueness invariant holds
    assert(out(1).getDouble(2) == 77.0)       // keep-first by orderable cols
  }

  test("patch with duplicate keys and ONLY map columns still resolves deterministically") {
    val target = Seq((1L, Map("color" -> "red"))).toDF("id", "props")
    val patches = Seq((1L, Map("a" -> "2")), (1L, Map("a" -> "1"))).toDF("id", "props")
    val out = Mutations.patch(target, patches, Seq("id"))
      .as[(Long, Map[String, String])].collect()
    assert(out.length == 1)
    // keep-first by canonical JSON of sorted entries: {"a":"1"} < {"a":"2"}
    assert(out(0)._2 == Map("color" -> "red", "a" -> "1"))
  }

  test("patch merges map columns per key like $set field-merge (mongraph.py:195-213)") {
    val target = Seq(
      (1L, Map("color" -> "red", "size" -> "xl")),
      (2L, Map("color" -> "blue"))).toDF("id", "props")
    val patches = Seq((1L, Map("size" -> "s", "new" -> "y"))).toDF("id", "props")
    val out = Mutations.patch(target, patches, Seq("id")).orderBy("id")
      .as[(Long, Map[String, String])].collect()
    // patched row: unmentioned key survives, patch keys win / append
    assert(out(0)._2 == Map("color" -> "red", "size" -> "s", "new" -> "y"))
    assert(out(1)._2 == Map("color" -> "blue")) // unpatched row untouched
  }

  test("deleteEdges removes exact (src,dst,label) only (mongraph.py:183-193)") {
    val e = Seq((1L, 2L, "a"), (1L, 2L, "b"), (2L, 1L, "a")).toDF("src", "dst", "label")
    val out = Mutations.deleteEdges(e, Seq((1L, 2L, "a")).toDF("src", "dst", "label"))
    assert(out.count() == 2)
  }
}
