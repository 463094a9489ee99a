package graft

import org.apache.spark.sql.functions._
import graft.functions.ArrayFunctions

/** BoundedLongList aggregator: hard buffer bound, exact contents for
  * non-overflowing groups, overflow detectable by size.
  */
class BoundedListSpec extends SparkSpec {
  import spark.implicits._

  test("bounded_collect_list: kept groups complete+sortable, overflowing groups capped at maxKeep") {
    val df = spark.range(100).select(lit(1L).as("g"), col("id"))
      .union(spark.range(3).select(lit(2L).as("g"), col("id")))
      .repartition(8) // force partial buffers + merges
    val out = df.groupBy("g")
      .agg(sort_array(ArrayFunctions.bounded_collect_list(col("id"), 10)).as("xs"))
      .as[(Long, Seq[Long])].collect().toMap
    // overflowing group: buffer never exceeds maxKeep elements
    assert(out(1L).size == 10)
    // non-overflowing group: nothing dropped, fully deterministic
    assert(out(2L) == Seq(0L, 1L, 2L))
  }

  test("caller contract: size(list) <= cap with maxKeep = cap+1 reproduces the exact DF cap") {
    val cap = 5
    val df = (Seq.tabulate(cap)(i => ("at_cap", i.toLong)) ++
      Seq.tabulate(cap + 3)(i => ("over", i.toLong))).toDF("g", "id")
    val kept = df.groupBy("g")
      .agg(ArrayFunctions.bounded_collect_list(col("id"), cap + 1).as("xs"))
      .filter(size(col("xs")) <= cap)
      .select("g").as[String].collect().toSeq
    assert(kept == Seq("at_cap")) // exactly-cap kept, over-cap dropped
  }
}
