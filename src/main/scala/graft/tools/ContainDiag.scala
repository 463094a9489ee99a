package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose dedup_containment's volume terms at a given SF —
  * which stage's row count grows superlinearly? (r15: the query's
  * shuffle-write grew 26×/decade sf1→sf10 against exactly-linear output.)
  * Usage: ContainDiag <sfDir>
  */
object ContainDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val len = 20; val stride = 5; val maxDf = graft.ops.llm.Dedup.ContainmentMaxDf
    val docs = graft.model.Tables(spark, sfDir, "documents")
    // r16 plan shape: xxhash64'd shingles deduped IN-ROW (array_distinct
    // over the transform) — no (doc, shingle) distinct shuffle exists any
    // more; the first and only shuffle of the exploded data is the
    // postings groupBy, carrying (long, long) rows.
    val sh = docs.filter(length(col("text")) >= len)
      .select(col("doc_id"), explode(array_distinct(expr(
        s"transform(sequence(1, length(text) - ${len - 1}, $stride)," +
          s" p -> xxhash64(substring(text, p, $len)))"))).as("sh"))
    println(s"[cdiag] shingle rows (per-doc distinct): ${sh.count()}")
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    println(s"[cdiag] shingle types: ${dfreq.count()}")
    val stats = dfreq.agg(
      sum(when(col("df") <= maxDf, col("df"))).as("posting_rows_capped"),
      sum(when(col("df") <= maxDf, col("df") * (col("df") - 1) / 2))
        .as("pair_stream_capped"),
      sum(when(col("df") > maxDf, lit(1))).as("over_cap_types"),
      max(col("df")).as("max_df")).collect()(0)
    println(s"[cdiag] posting rows (df<=cap): ${stats.get(0)}")
    println(s"[cdiag] pair stream sum C(df,2): ${stats.get(1)}")
    println(s"[cdiag] types over cap: ${stats.get(2)}, max df: ${stats.get(3)}")
    dfreq.orderBy(col("df").desc, col("sh")).limit(10).collect()
      .foreach(r => println(s"[cdiag] top df=${r.get(1)} sh_hash=${r.get(0)}"))
    spark.stop()
  }
}
