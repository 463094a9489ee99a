package graft

import org.apache.spark.sql.functions._
import graft.ops.llm.TextAnalysis

/** Hand-checked values for the round-6 text ops: Gopher repetition
  * signals and the top-k vocabulary with cumulative coverage.
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("repetition: hand-computed fractions and the 0.18 flag") {
    val docs = Seq(
      (1L, "a a a a"),        // 4 tokens, 1 distinct; bigrams: "a a"×3
      (2L, "x y z w"),        // no repetition; bigrams all distinct
      (3L, "solo")            // <2 tokens → excluded
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0.75, 1.0, true),
      (2L, 4L, 0.0, math.rint(1.0 / 3 * 1e6) / 1e6, true)))
    // doc 2's top bigram frac is 1/3 ≈ 0.333 — above Gopher's 0.18 only
    // because the doc is tiny; that is the documented small-doc caveat
  }

  test("lmScoreBigram: hand-computed fixed-point units over a tiny corpus") {
    // corpus bigrams: "a b"×2 ("a b c", "a b"), "b c"×1 → c(a·)=2, c(b·)=1
    // units: "a b" → 2e6 div 2 = 1000000; "b c" → 1e6 div 1 = 1000000
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScoreBigram(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2000000L, 1.0), // both bigrams deterministic under this corpus
      (2L, 1L, 1000000L, 1.0)))
    // a corpus where the left context splits: "a b" vs "a c" each once
    val docs2 = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val got2 = TextAnalysis.lmScoreBigram(docs2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // c(a·)=2 → each bigram unit = 1e6 div 2 = 500000 → score 0.5
    assert(got2 == Seq((1L, 1L, 500000L, 0.5), (2L, 1L, 500000L, 0.5)))
  }

  test("repetition: non-repetitive long doc stays under the flag") {
    val text = (0 until 100).map(i => s"w$i").mkString(" ")
    val got = TextAnalysis.repetition(Seq((1L, text)).toDF("doc_id", "text"))
      .as[(Long, Long, Double, Double, Boolean)].collect().head
    assert(got._3 == 0.0 && !got._5)
  }

  test("vocabTopK: deterministic rank, counts, cumulative coverage") {
    val docs = Seq((1L, "b a b c b a"), (2L, "a c a d")).toDF("doc_id", "text")
    // counts: a=4, b=3, c=2, d=1 (total 10)
    val got = TextAnalysis.vocabTopK(docs, k = 3)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 4L, 0.4), (2L, "b", 3L, 0.7), (3L, "c", 2L, 0.9)))
  }

  test("vocabTopK: count ties break by token ascending") {
    val docs = Seq((1L, "z y z y x")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabTopK(docs, k = 3)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got.map(_._2) == Seq("y", "z", "x"))
  }

  test("bpeMergePairs: pair counts weighted by word frequency, 1-char words skipped") {
    // words: "abc"×1 → pairs ab, bc; "ab"×2 → pair ab; "x" skipped (<2 chars)
    val docs = Seq((1L, "abc ab x"), (2L, "ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergePairs(docs, k = 5)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "ab", 3L), (2L, "bc", 1L)))
  }

  test("bpeMergePairs: weight ties break by pair ascending") {
    val docs = Seq((1L, "zy ba")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMergePairs(docs, k = 2)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "ba", 1L), (2L, "zy", 1L)))
  }

  test("tfidfTopK: score = tf*N/df, rarer terms rank first") {
    // N=2; df: a=2, b=1, c=1. doc1 "a a b": a tf=2 score=2*2/2=2.0,
    // b tf=1 score=1*2/1=2.0 → tie broken by token asc → a first.
    // doc2 "a c": c score=2.0, a score=1.0.
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopK(docs, k = 2)
      .as[(Long, Long, String, Long, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._2))
    assert(got == Seq(
      (1L, 1L, "a", 2L, 2L, 2.0), (1L, 2L, "b", 1L, 1L, 2.0),
      (2L, 1L, "c", 1L, 1L, 2.0), (2L, 2L, "a", 1L, 2L, 1.0)))
  }
}
