package graft

import org.apache.spark.sql.functions._
import graft.ops.SnapshotDiff

/** Snapshot CDC: added/removed/changed classification, unchanged rows
  * dropped, null-safe value compare, schema guard.
  */
class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private lazy val old = Seq(
    (1L, "a", "same"), (2L, "b", "will-change"), (3L, "c", "will-remove"),
    (4L, "d", null.asInstanceOf[String])
  ).toDF("id", "label", "name")

  private lazy val neu = Seq(
    (1L, "a", "same"), (2L, "b", "changed!"),
    (4L, "d", "was-null"), (5L, "e", "brand-new")
  ).toDF("id", "label", "name")

  test("classifies added/removed/changed and drops unchanged") {
    val got = SnapshotDiff.diff(old, neu, Seq("id"))
      .select("id", "change").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "removed",
      4L -> "changed", 5L -> "added")) // id 1 unchanged → absent
  }

  test("null-safe: a NULL→value flip is a change, value structs preserved") {
    val r = SnapshotDiff.diff(old, neu, Seq("id")).filter(col("id") === 4L).head()
    assert(r.getAs[String]("change") == "changed")
    assert(r.getStruct(r.fieldIndex("old_val")).isNullAt(1))
    assert(r.getStruct(r.fieldIndex("new_val")).getString(1) == "was-null")
  }

  test("schema mismatch is rejected loudly") {
    val err = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(old, neu.drop("name"), Seq("id"))
    }
    assert(err.getMessage.contains("schemas differ"))
  }

  test("key-only snapshots degrade to a membership diff (edge CDC shape)") {
    val oldE = Seq((1L, 2L, "x"), (1L, 3L, "x"), (2L, 3L, "y"))
      .toDF("src", "dst", "label")
    val neuE = Seq((1L, 2L, "x"), (2L, 3L, "y"), (3L, 1L, "z"))
      .toDF("src", "dst", "label")
    val d = SnapshotDiff.diff(oldE, neuE, Seq("src", "dst", "label"))
    val got = d.select("src", "dst", "label", "change")
      .as[(Long, Long, String, String)].collect().toSet
    // only membership changes; `changed` impossible by construction
    assert(got == Set((1L, 3L, "x", "removed"), (3L, 1L, "z", "added")))
    // and the round-trip contract still holds through the boolean markers
    val rt = SnapshotDiff.applyDelta(oldE, d, Seq("src", "dst", "label"))
      .as[(Long, Long, String)].collect().toSet
    assert(rt == neuE.as[(Long, Long, String)].collect().toSet)
  }

  test("applyDelta reconstructs the new snapshot: applyDelta(old, diff(old,new)) == new") {
    val got = SnapshotDiff.applyDelta(old, SnapshotDiff.diff(old, neu, Seq("id")), Seq("id"))
      .as[(Long, String, String)].collect().toSet
    assert(got == neu.as[(Long, String, String)].collect().toSet)
  }

  test("property: diff/applyDelta round-trip on random snapshots") {
    def check(p: org.scalacheck.Prop): Unit = {
      val res = org.scalacheck.Test.check(
        org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(6), p)
      assert(res.passed, res.status.toString)
    }
    import org.scalacheck.Gen
    // ids include None → a NULL key (allowed: keys must be UNIQUE, not
    // non-null; diff/applyDelta join keys null-safely)
    val snapGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.option(Gen.chooseNum(1L, 8L)), Gen.oneOf("a", "b"),
        Gen.option(Gen.oneOf("x", "y", "z"))))
        .map(_.map { case (id, l, nm) => (id.map(java.lang.Long.valueOf).orNull, l, nm.orNull) }
          .groupBy(_._1).map(_._2.head).toSeq)) // unique keys (incl. ≤1 NULL)
    check(org.scalacheck.Prop.forAll(snapGen, snapGen) { (a, b) =>
      val oldDf = a.toDF("id", "label", "name")
      val newDf = b.toDF("id", "label", "name")
      val rebuilt = SnapshotDiff
        .applyDelta(oldDf, SnapshotDiff.diff(oldDf, newDf, Seq("id")), Seq("id"))
        .as[(Option[Long], String, String)].collect().toSet
      rebuilt == newDf.as[(Option[Long], String, String)].collect().toSet
    })
  }

  test("NULL key is a single 'changed' row, not a spurious removed+added pair") {
    val o = Seq((null.asInstanceOf[java.lang.Long], "a", "x")).toDF("id", "label", "name")
    val n = Seq((null.asInstanceOf[java.lang.Long], "a", "y")).toDF("id", "label", "name")
    val d = SnapshotDiff.diff(o, n, Seq("id")).collect()
    assert(d.length == 1 && d(0).getAs[String]("change") == "changed")
    val rebuilt = SnapshotDiff.applyDelta(o, SnapshotDiff.diff(o, n, Seq("id")), Seq("id"))
      .as[(Option[Long], String, String)].collect().toSet
    assert(rebuilt == Set((None, "a", "y")))
  }

  test("plan shape: one key-partitioned join, no cartesian/nested-loop") {
    // the 100 TB contract: CDC is a single full-outer join on the snapshot
    // key — never a broadcast (both sides are snapshot-sized) and never a
    // nested-loop/cartesian product.
    val plan = SnapshotDiff.diff(old, neu, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
      s"expected a full-outer sort-merge join, plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      s"no cartesian/nested-loop expected, plan:\n$plan")
  }

  test("membership (key-only) diff plans as one hash-aggregate, no join at all") {
    val oldE = Seq((1L, 2L, "x"), (1L, 3L, "x")).toDF("src", "dst", "label")
    val neuE = Seq((1L, 2L, "x"), (3L, 1L, "z")).toDF("src", "dst", "label")
    val plan = SnapshotDiff.diff(oldE, neuE, Seq("src", "dst", "label"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), s"expected the agg path, plan:\n$plan")
    assert(!plan.contains("Join"), s"membership diff must not join, plan:\n$plan")
    // presence markers keep the full-outer NULL contract: absent side NULL
    val rows = SnapshotDiff.diff(oldE, neuE, Seq("src", "dst", "label"))
      .orderBy("src").collect()
    assert(rows(0).getAs[String]("change") == "removed"
      && rows(0).getAs[Any]("new_val") == null && rows(0).getBoolean(rows(0).fieldIndex("old_val")))
    assert(rows(1).getAs[String]("change") == "added"
      && rows(1).getAs[Any]("old_val") == null && rows(1).getBoolean(rows(1).fieldIndex("new_val")))
  }

  test("membership diff groups NULL keys like the null-safe join would") {
    val oldE = Seq((null.asInstanceOf[java.lang.Long], "x")).toDF("src", "label")
    val neuE = Seq((null.asInstanceOf[java.lang.Long], "x"),
      (null.asInstanceOf[java.lang.Long], "y")).toDF("src", "label")
    val got = SnapshotDiff.diff(oldE, neuE, Seq("src", "label"))
      .select("label", "change").as[(String, String)].collect().toSet
    assert(got == Set(("y", "added")))
  }

  test("checkKeys = true rejects duplicate keys loudly") {
    val dup = old.unionByName(old.limit(1))
    val err = intercept[IllegalArgumentException] {
      SnapshotDiff.diff(dup, neu, Seq("id"), checkKeys = true)
    }
    assert(err.getMessage.contains("duplicate keys"))
    // clean snapshots pass the check and diff normally
    assert(SnapshotDiff.diff(old, neu, Seq("id"), checkKeys = true).count() == 4L)
  }
}
