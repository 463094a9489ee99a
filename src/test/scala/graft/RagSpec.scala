package graft

import org.apache.spark.sql.functions._
import graft.ops.llm.{Dedup, Rag}

/** RAG pipeline: hash-feature embeddings (exact sums, FLOAT cast) and
  * end-to-end chunk retrieval.
  */
class RagSpec extends SparkSpec {
  import spark.implicits._

  test("hashEmbed matches a hand-computed feature vector") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val got = Rag.hashEmbed(docs, "text", Seq("doc_id"))
      .select("embedding").as[Seq[Float]].collect().head
    val center = (Dedup.P - 1) / 2
    def fold(s: String) = graft.functions.PolyFoldUtil.fold(
      org.apache.spark.unsafe.types.UTF8String.fromString(s), Dedup.P)
    val expected = Rag.featureConstants.map { case (a, b) =>
      Seq("a", "b").map(t => (a * fold(t) + b) % Dedup.P - center).sum.toFloat
    }
    assert(got == expected)
    assert(got.length == Rag.Dims)
  }

  test("retrieve: a query identical to a corpus doc hits its chunk at score 1.0") {
    val same = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, same),                                     // corpus (one chunk)
      (2L, "totally different tokens here now yes"),  // corpus
      (50L, same)                                     // query (pred: %50==0)
    ).toDF("doc_id", "text")
    val got = Rag.retrieve(docs, col("doc_id") % 50 === 0, k = 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.head == ((50L, 1L, 1L, 0L, 1.0)))
    assert(got.size == 2 && got(1)._3 == 2L && got(1)._5 < 1.0)
  }

  test("retrieve is partitioning-invariant") {
    val docs = (0L until 60L).map { i =>
      (i, Seq.tabulate(8 + (i % 7).toInt)(j => s"w${(i * 5 + j * 2) % 13}").mkString(" "))
    }.toDF("doc_id", "text")
    val a = Rag.retrieve(docs.repartition(1), col("doc_id") % 10 === 0)
      .collect().toSeq
    val b = Rag.retrieve(docs.repartition(7), col("doc_id") % 10 === 0)
      .collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
