package graft

import graft.ops.Traverse

/** Traversal semantics (FIXTURES.md §C fixtures 4, 5, 9). */
class TraverseSpec extends SparkSpec {
  import spark.implicits._

  // path A(1)—B(2)—C(3), plus D(4)—E(5) disconnected
  private lazy val pathEdges =
    Seq((1L, 2L, "e"), (2L, 3L, "e"), (4L, 5L, "e")).toDF("src", "dst", "label")

  test("1-hop neighborhood includes the seed itself (mongraph.py:243-245)") {
    val ids = Traverse.neighborIds(pathEdges, 2L).orderBy("id").as[Long].collect()
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("1-hop is undirected: edge direction does not matter (mongraph.py:236-241)") {
    val ids = Traverse.neighborIds(pathEdges, 3L).orderBy("id").as[Long].collect()
    assert(ids.toSeq == Seq(2L, 3L)) // 3 is only a dst; still sees its src
  }

  test("1-hop of an isolated vertex is empty: only endpoints of found edges count (mongraph.py:243-245)") {
    assert(Traverse.neighborIds(pathEdges, 9L).isEmpty)
  }

  test("k-hop is depth-bounded with visited dedup; khop(k) ⊆ khop(k+1)") {
    val path6 = Seq((1L, 2L, "e"), (2L, 3L, "e"), (3L, 4L, "e"), (4L, 5L, "e"), (5L, 6L, "e"))
      .toDF("src", "dst", "label")
    val k1 = Traverse.kHopIds(path6, 1L, 1).as[Long].collect().toSet
    val k2 = Traverse.kHopIds(path6, 1L, 2).as[Long].collect().toSet
    val k5 = Traverse.kHopIds(path6, 1L, 5).as[Long].collect().toSet
    assert(k1 == Set(1L, 2L))
    assert(k2 == Set(1L, 2L, 3L))
    assert(k5 == Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(k1.subsetOf(k2) && k2.subsetOf(k5))
  }

  test("k-hop does not leak across disconnected components") {
    val ids = Traverse.kHopIds(pathEdges, 1L, 10).as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L))
  }

  test("ego subgraph induces edges among visited vertices only") {
    val v = Seq((1L, "x", "A"), (2L, "x", "B"), (3L, "x", "C"), (4L, "x", "D"))
      .toDF("id", "label", "name")
    val e = Seq((1L, 2L, "e"), (1L, 3L, "e"), (3L, 4L, "e")).toDF("src", "dst", "label")
    val (vs, es) = Traverse.egoSubgraph(v, e, 1L, 1)
    assert(vs.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    assert(es.count() == 2) // (3,4) excluded: 4 not visited at depth 1
  }

  test("golden ego-subgraph JSON export (build_graph intent, mongraph.py:276-303)") {
    val v = Seq((1L, "x", "A"), (2L, "x", "B"), (3L, "x", "C"), (4L, "x", "D"))
      .toDF("id", "label", "name")
    val e = Seq((1L, 2L, "e"), (1L, 3L, "e"), (3L, 4L, "e")).toDF("src", "dst", "label")
    val json = Traverse.egoSubgraphJson(v, e, 1L, 1)
    val expected =
      """{"graph":{"vertices":[{"id":1,"label":"x","name":"A"},{"id":2,"label":"x","name":"B"},""" +
        """{"id":3,"label":"x","name":"C"}],"edges":[{"src":1,"dst":2,"label":"e"},{"src":1,"dst":3,"label":"e"}]}}"""
    assert(json == expected)
  }

  test("degrees: undirected, zero-degree vertices included; sum(degree) = 2|E|") {
    val v = Seq((1L, "x", "A"), (2L, "x", "B"), (3L, "x", "C"), (4L, "x", "D"))
      .toDF("id", "label", "name")
    val e = Seq((1L, 2L, "e"), (2L, 3L, "e")).toDF("src", "dst", "label")
    val deg = Traverse.degrees(v, e).orderBy("id").select("degree").as[Long].collect()
    assert(deg.toSeq == Seq(1L, 2L, 1L, 0L))
    assert(deg.sum == 2 * e.count())
  }
}
