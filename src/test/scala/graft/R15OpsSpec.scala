package graft

import org.apache.spark.sql.functions._
import graft.ops.llm.Shuffle
import graft.model.DerivedGraph

/** Round-15 hardening contracts: the Shuffle two-level rank helpers raise
  * on NULL keys (the silent-drop class ADVICE r13 #4 closed in Windows,
  * extended here per ADVICE r14), and the DerivedGraph storage-policy
  * decision function (VERDICT r14 #4) picks the persist level a cluster
  * operator would.
  */
class R15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))

  test("stratifiedRowNumber raises on a NULL key instead of silently dropping the row") {
    val df = Seq((Some(1L), "en"), (None, "en"), (Some(3L), "fr"))
      .toDF("doc_id", "lang")
    val ex = intercept[Exception] {
      Shuffle.stratifiedRowNumber(df, "lang", "doc_id").collect()
    }
    assert(msgs(ex).exists(_.contains("NULL key")),
      s"expected the precondition message, got: ${ex.getMessage}")
  }

  test("globalRowNumber raises on a NULL key instead of silently dropping the row") {
    val df = Seq((Some(1L), 1L), (None, 2L), (Some(3L), 3L))
      .toDF("k", "id")
    val ex = intercept[Exception] {
      Shuffle.globalRowNumber(df, "k", "id", keyBound = 100L).collect()
    }
    assert(msgs(ex).exists(_.contains("NULL key")),
      s"expected the precondition message, got: ${ex.getMessage}")
  }

  test("stratifiedRowNumber values are unchanged by the guard (non-null keys)") {
    val df = (0 until 60).map(i => (i.toLong * 7, s"s${i % 3}")).toDF("doc_id", "lang")
    val ref = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang").orderBy("doc_id"))
        .cast("long"))
      .select("lang", "doc_id", "rn").as[(String, Long, Long)].collect().toSet
    val got = Shuffle.stratifiedRowNumber(df, "lang", "doc_id", buckets = 4)
      .select("lang", "doc_id", "rn").as[(String, Long, Long)].collect().toSet
    assert(got == ref)
  }

  test("storage policy: small graph persists deserialized (today's sf0.001-sf10 behavior)") {
    val gb = 1L << 30
    // sf0.1-shaped: ~3 MB fact parquet, 2.4 GB storage share, plenty of disk
    assert(DerivedGraph.choosePolicy(3L << 20, (2.4 * gb).toLong, 45 * gb) == "default")
    // sf10-shaped under a probe heap: ~1.5 GB parquet, 30 GB storage share
    assert(DerivedGraph.choosePolicy(3L * gb / 2, 30 * gb, 45 * gb) == "default")
  }

  test("storage policy: fits disk but not memory -> DISK_ONLY; fits neither -> none") {
    val gb = 1L << 30
    // 4 GB parquet -> ~12 GB cached; 2.4 GB storage share; 100 GB free disk
    assert(DerivedGraph.choosePolicy(4 * gb, (2.4 * gb).toLong, 100 * gb) == "disk")
    // the r14 sf100 incident shape: 14 GB parquet -> ~42 GB cached, which
    // overflows a 2.4 GB share and needs ~84 GB of headroom on a 45 GB-free
    // disk -> none (the session formerly died mid-persist-fill here)
    assert(DerivedGraph.choosePolicy(14 * gb, (2.4 * gb).toLong, 45 * gb) == "none")
    assert(DerivedGraph.choosePolicy(14 * gb, 30 * gb, 45 * gb) == "none")
  }
}
