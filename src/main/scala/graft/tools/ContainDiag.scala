package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose dedup_containment's volume terms at a given SF —
  * which stage's row count grows superlinearly? (r15: the query's
  * shuffle-write grew 26×/decade sf1→sf10 against exactly-linear output.)
  *
  * Optional second arg `injectGroups=G` (VERDICT r16 #2: show the
  * ContainmentMaxDf cap ENGAGING, not just its algebra): every doc gets a
  * 120-char boilerplate block appended, chosen by `doc_id % G`, so each
  * block's ~21 shingle types land at df ≈ docs/G. Pick G so df falls just
  * UNDER the cap (pair stream jumps but stays ≤ (maxDf/2)·posting_rows)
  * and well OVER it (the types leave the index entirely and contribute
  * nothing) — the capped-regime measurement the r16 pair-stream argument
  * rests on.
  *
  * Usage: ContainDiag <sfDir> [injectGroups=0]
  */
object ContainDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val injectGroups = args.lift(1).map(_.toInt).getOrElse(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val len = 20; val stride = 5; val maxDf = graft.ops.llm.Dedup.ContainmentMaxDf
    val base = graft.model.Tables(spark, sfDir, "documents")
    val docs = if (injectGroups <= 0) base else {
      // 120 chars ⇒ (120+len)/stride ≈ 28 shingle types per block shared
      // by every doc in the group (plus ~len/stride boundary types unique
      // per (group, doc-tail) — noise). format_string pads the group id so
      // every block has identical length.
      base.withColumn("text", concat(col("text"),
        format_string(" BOILERPLATE-%06d", pmod(col("doc_id"), lit(injectGroups.toLong))),
        lit(" the quick brown fox jumps over the lazy dog and keeps on running through the mill "),
        format_string("END-%06d", pmod(col("doc_id"), lit(injectGroups.toLong)))))
    }
    if (injectGroups > 0)
      println(s"[cdiag] injected $injectGroups boilerplate groups over " +
        s"${docs.count()} docs => expected shared df ~ docs/G")
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
