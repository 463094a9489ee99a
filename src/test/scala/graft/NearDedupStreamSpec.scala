package graft

import graft.ops.llm.{Dedup, NearDedupView}
import org.apache.spark.sql.DataFrame

/** Streaming MinHash near-dedup twin: the foreachBatch fold over the
  * maintained bucket index must equal the batch `verifiedClusters`
  * pipeline over EVERY batch prefix — for an arrival order that is not
  * id order, including a later arrival that bridges two existing
  * clusters and flips a survivor verdict (rep = component min).
  */
class NearDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // 30-token base text → 28 shingles; variants tweak one end token
  // (Jaccard ≈ 0.8 to base, ≈ 0.66 to each other — above threshold).
  private val baseToks = (1 to 30).map(i => s"w$i")
  private val textBase = baseToks.mkString(" ")
  private val textLastChanged = (baseToks.dropRight(1) :+ "zz").mkString(" ")
  private val textFirstChanged = ("aa" +: baseToks.drop(1)).mkString(" ")

  /** id → text. Exact-dup trio {1, 11, 21}; near-dup chain {2, 12, 22}
    * bridged by 12 (2 = last-changed, 22 = first-changed: similar to the
    * base 12, not to each other); 3..5 unique.
    */
  private val corpus: Map[Long, String] = Map(
    1L -> "the quick brown fox jumps over the lazy dog again and again today",
    11L -> "the quick brown fox jumps over the lazy dog again and again today",
    21L -> "the quick brown fox jumps over the lazy dog again and again today",
    2L -> textLastChanged,
    12L -> textBase,
    22L -> textFirstChanged,
    3L -> "completely unrelated first document about graph analytics at scale",
    4L -> "another singleton row describing streaming watermarks and state stores",
    5L -> "a third unique text mentioning parquet pushdown and partition pruning")

  private def docsDF(ids: Seq[Long]): DataFrame =
    ids.map(id => (id, corpus(id))).toDF("doc_id", "text")

  private def canon(df: DataFrame): Set[(Long, Long, Boolean)] =
    df.select("doc_id", "cluster_rep", "kept").as[(Long, Long, Boolean)]
      .collect().toSet

  test("fold equals batch pipeline over every batch prefix; bridge flips rep") {
    // arrival order is NOT id order; the exact trio is split so that the
    // smallest id (1) arrives LAST and steals the representative role.
    val batches = Seq(Seq(11L, 2L, 4L, 21L), Seq(12L, 5L, 22L), Seq(1L, 3L))
    val view = new NearDedupView(spark)
    var prefix = Seq.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Set[(Long, Long, Boolean)]]
    for (b <- batches) {
      view.processBatch(docsDF(b))
      prefix ++= b
      val stream = canon(view.verdicts)
      val batch = canon(Dedup.verifiedClusters(docsDF(prefix)))
      assert(stream == batch, s"prefix $prefix: stream=$stream batch=$batch")
      seen += stream
    }
    // batch 1: 11 and 21 are exact dups → 11 is the survivor
    assert(seen(0).contains((11L, 11L, true)) && seen(0).contains((21L, 11L, false)))
    // batch 3: doc 1 (smaller id, identical text) joins and flips 11's verdict
    assert(seen(2).contains((1L, 1L, true)) && seen(2).contains((11L, 1L, false)))
    // the near-dup chain bridged by 12 forms one component with rep 2
    assert(seen(2).contains((12L, 2L, false)) || !seen(2).exists(_._1 == 12L),
      "if LSH surfaced the chain it must be one rep-2 component")
    // uniques never enter the pair graph
    assert(!seen(2).exists(v => Set(3L, 4L, 5L).contains(v._1)))
  }

  test("drives under Structured Streaming foreachBatch") {
    implicit val ctx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val df = in.toDF().toDF("doc_id", "text")
    val view = new NearDedupView(spark)
    val q = df.writeStream.outputMode("append").foreachBatch(view.sink _).start()
    try {
      in.addData((11L, corpus(11L)), (21L, corpus(21L)))
      q.processAllAvailable()
      assert(canon(view.verdicts) == canon(
        Dedup.verifiedClusters(docsDF(Seq(11L, 21L)))))
      in.addData((1L, corpus(1L)), (3L, corpus(3L)))
      q.processAllAvailable()
      val v = canon(view.verdicts)
      assert(v == canon(Dedup.verifiedClusters(docsDF(Seq(11L, 21L, 1L, 3L)))))
      assert(v.contains((1L, 1L, true)) && v.contains((11L, 1L, false)))
      val (nb, ns, np) = view.stateSizes
      assert(ns == 4L && np >= 3L && nb == 4L * Dedup.DefaultBands)
    } finally q.stop()
  }
}
