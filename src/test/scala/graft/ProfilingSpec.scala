package graft

import graft.ops.Profiling

/** Hand-checked per-column profile: nulls, exact distincts, integral
  * min/max, non-integral columns get NULL min/max.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profile: one row per column with exact counts") {
    val df = Seq(
      (Some(1L), "a"), (Some(2L), "b"), (Some(2L), null.asInstanceOf[String]),
      (None, "a")
    ).map { case (k, s) => (k.map(java.lang.Long.valueOf).orNull, s) }
      .toDF("k", "s")
    val got = Profiling.profile(df, Seq("k", "s"), Set("k"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])].collect().toSeq
    assert(got == Seq(
      ("k", 4L, 1L, 2L, Some(1L), Some(2L)),
      ("s", 4L, 1L, 2L, None, None)))
  }

  test("profile rejects intCols outside the profiled set") {
    val df = Seq((1L, "a")).toDF("k", "s")
    val err = intercept[IllegalArgumentException] {
      Profiling.profile(df, Seq("k"), Set("s"))
    }
    assert(err.getMessage.contains("intCols"))
  }

  test("generated oracle SQL covers every profiled column once") {
    val sql = Profiling.profileOracleSql("orders", Seq("a", "b"), Set("a"))
    assert(sql.split("UNION ALL").length == 2)
    assert(sql.contains("'a' AS col_name") && sql.contains("'b' AS col_name"))
  }
}
