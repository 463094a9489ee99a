package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.llm.Shuffle

/** Deterministic shuffle: the key is a permutation (distinct ids →
  * distinct keys), positions are a bijection onto 1..n, the distributed
  * two-level rank equals the plain global window, the result is
  * partitioning-invariant, and the order actually scrambles id order.
  */
class ShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Long) = spark.range(n)
    .select(col("id").as("doc_id"), (col("id") % 7).cast("string").as("source"))

  test("positions are a bijection onto 1..n and keys are distinct") {
    val out = Shuffle.deterministicShuffle(docs(5000)).cache()
    assert(out.select("pos").distinct().count() == 5000)
    assert(out.agg(min("pos"), max("pos")).as[(Long, Long)].head() == ((1L, 5000L)))
    assert(out.select("shuffle_key").distinct().count() == 5000)
  }

  test("distributed rank equals the single-window spelling exactly") {
    val d = docs(3000)
    val dist = Shuffle.deterministicShuffle(d)
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    val w = Window.orderBy(col("shuffle_key"), col("doc_id"))
    val ref = d.withColumn("shuffle_key", Shuffle.shuffleKey(col("doc_id")))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "pos").as[(Long, Long)].collect().toMap
    assert(dist == ref)
  }

  test("partitioning-invariant") {
    val a = Shuffle.deterministicShuffle(docs(2000).repartition(1))
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    val b = Shuffle.deterministicShuffle(docs(2000).repartition(13))
      .select("doc_id", "pos").as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("the shuffled order scrambles sequential ids (not a near-identity)") {
    val out = Shuffle.deterministicShuffle(docs(4000))
      .select("doc_id", "pos").as[(Long, Long)].collect().toSeq
    // count adjacent-position pairs whose ids are also adjacent — a real
    // permutation leaves only a vanishing fraction (expected ~2/n per
    // pair, so ~2 total); a broken near-identity order leaves thousands
    val byPos = out.sortBy(_._2).map(_._1)
    val adjacent = byPos.sliding(2).count { case Seq(x, y) => math.abs(y - x) == 1 }
    assert(adjacent < 40, s"$adjacent adjacent-id pairs — order barely shuffled")
  }

  test("globalRowNumber handles skewless uniform keys with tiny bucket table") {
    val d = docs(3000).withColumn("shuffle_key", Shuffle.shuffleKey(col("doc_id")))
    val out = Shuffle.globalRowNumber(d, "shuffle_key", "doc_id", Shuffle.P, buckets = 8)
    assert(out.select("pos").distinct().count() == 3000)
  }
}
