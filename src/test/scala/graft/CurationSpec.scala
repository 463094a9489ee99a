package graft

import org.apache.spark.sql.functions._
import graft.ops.llm.Curation

/** Corpus-curation operators: PII redaction (pattern order semantics),
  * contamination detection, and the unigram quality score on hand-computed
  * fixtures.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("piiRedact: all four patterns, applied in the declared order") {
    val df = Seq(
      (1L, "contact bob.smith+x@mail.example.org or 192.168.0.1 ref Customer#000000042 code 987654"),
      (2L, "no pii here"),
      (3L, "just numbers 12345678 and 42")
    ).toDF("id", "text")
    val got = Curation.piiRedact(df, "text", "id").orderBy("id").collect()
    assert(got(0).getAs[String]("redacted") ==
      "contact <EMAIL> or <IP> ref <NAME> code <NUM>")
    assert(got(0).getAs[Long]("n_email") == 1L)
    assert(got(0).getAs[Long]("n_ipv4") == 1L)
    assert(got(0).getAs[Long]("n_name") == 1L)
    // the 9-digit run inside Customer#000000042 is consumed by the NAME
    // rule first — only "987654" remains for the digit-run rule.
    assert(got(0).getAs[Long]("n_num") == 1L)
    assert(got(1).getAs[String]("redacted") == "no pii here")
    assert(Seq("n_email", "n_ipv4", "n_name", "n_num").forall(c => got(1).getAs[Long](c) == 0L))
    assert(got(2).getAs[String]("redacted") == "just numbers <NUM> and 42")
  }

  test("contamination: flags eval overlap at the shared-gram threshold, ignores below") {
    // doc 100 = eval (id % 50 == 0). doc 1 shares a 6-token run with it
    // (two distinct 5-grams... need >= 3 shared: share 7 tokens = three
    // 5-grams). doc 2 shares nothing.
    val run = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (100L, s"$run theta iota"),
      (1L, s"$run completely different tail here"),
      (2L, "unrelated words only nothing shared at all")
    ).toDF("doc_id", "text")
    val got = Curation.contamination(docs, col("doc_id") % 50 === 0)
      .select("doc_id", "eval_id", "n_shared").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 3L)), s"got $got")
  }

  test("unigramQuality: hand-computed mean inverse probability") {
    // corpus: "a a b" + "b" → N=4; cnt(a)=2, cnt(b)=2.
    // doc 1 tokens (a,a,b): each s = round(4/2, 6) = 2.0 → score 2.0
    val docs = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = Curation.unigramQuality(docs).orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_tokens") == 3L)
    assert(got(0).getAs[Double]("score") == 2.0)
    assert(got(1).getAs[Long]("n_tokens") == 1L)
    assert(got(1).getAs[Double]("score") == 2.0)
  }

  test("piiRedact runs unchanged under Structured Streaming (batch/stream unification)") {
    // the scrub is a pure projection, so the same transform must work on a
    // streaming frame — the shape a continuous training-data ingest needs.
    implicit val ctx = spark.sqlContext
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = Curation.piiRedact(stream.toDF().toDF("id", "text"), "text", "id")
      .writeStream.outputMode("append").format("memory").queryName("pii_out").start()
    try {
      stream.addData((1L, "mail a@b.co num 55556666"), (2L, "clean"))
      q.processAllAvailable()
      val got = spark.table("pii_out").orderBy("id").collect()
      assert(got(0).getAs[String]("redacted") == "mail <EMAIL> num <NUM>")
      assert(got(1).getAs[String]("redacted") == "clean")
    } finally q.stop()
  }

  test("unigramQuality: rare tokens score higher than common ones") {
    val docs = Seq(
      (1L, "common common common common common common common"),
      (2L, "rareword common common common common common common")
    ).toDF("doc_id", "text")
    val s = Curation.unigramQuality(docs).orderBy("doc_id")
      .select("score").as[Double].collect()
    assert(s(1) > s(0), s"rare-token doc must score higher: ${s.toSeq}")
  }

  test("contaminationStreaming flags a streamed doc against the static eval set") {
    implicit val ctx = spark.sqlContext
    val run = "alpha beta gamma delta epsilon zeta eta"
    val evalDocs = Seq((100L, s"$run theta iota")).toDF("doc_id", "text")
    val stream =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, java.sql.Timestamp, String)]
    val q = Curation.contaminationStreaming(
      stream.toDF().toDF("doc_id", "ts", "text"), evalDocs)
      .writeStream.outputMode("update").format("memory").queryName("cont_out").start()
    try {
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
      stream.addData((1L, t0, s"$run different tail here"),
        (2L, t0, "unrelated words only nothing shared at all"))
      q.processAllAvailable()
      val got = spark.table("cont_out")
        .select("doc_id", "eval_id", "n_shared").as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 100L, 3L)), s"got $got")
    } finally q.stop()
  }

  // ---- ScalaCheck properties -------------------------------------------

  private def check(p: org.scalacheck.Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(6), p)
    assert(res.passed, res.status.toString)
  }

  private val piiTextGen: org.scalacheck.Gen[String] = {
    import org.scalacheck.Gen
    val word = Gen.oneOf("alpha", "beta", "scan", "x9", "q", "Customer#12345678",
      "bob@mail.example.com", "10.1.2.3", "99887766", "v2.1", "2024-01-01")
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
  }

  test("property: piiRedact is idempotent — a redacted text has no PII left") {
    check(org.scalacheck.Prop.forAll(piiTextGen) { text =>
      val once = Curation.piiRedact(
        Seq((1L, text)).toDF("id", "text"), "text", "id")
        .head().getAs[String]("redacted")
      val again = Curation.piiRedact(
        Seq((1L, once)).toDF("id", "text"), "text", "id").head()
      again.getAs[String]("redacted") == once &&
        Seq("n_email", "n_ipv4", "n_name", "n_num")
          .forall(c => again.getAs[Long](c) == 0L)
    })
  }

  test("curation_pipeline: composed stages fuse — no cartesian, bounded exchanges, sane output") {
    val df = graft.QueriesLlm.defs("curation_pipeline").fn(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan
    val planStr = plan.toString
    assert(!planStr.contains("CartesianProduct"),
      s"no cartesian expected, plan:\n$planStr")
    // the only nested-loop is the single-row median-threshold broadcast —
    // the by-design scalar join (same audit class as quality_filter)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(planStr).size
    assert(bnlj <= 1, s"expected at most the scalar-threshold BNLJ, got $bnlj:\n$planStr")
    // stage budget for the WHOLE five-stage pipeline: median histogram agg
    // (2: groupBy + single-row fold), dedup window (1), contamination
    // gram-pair agg + distinct (2), anti-join (≤2), stratified-sample
    // window (1), final sort (1) ≈ 9 — redundant per-stage exchanges
    // (e.g. re-shuffling between redact → dedup, which must fuse into the
    // window's exchange) would push past it.
    val shuffles = planStr.sliding("ShuffleExchange".length)
      .count(_ == "ShuffleExchange")
    assert(shuffles <= 10, s"too many shuffles ($shuffles) — stages not fusing:\n$planStr")
    // output sanity: rows exist, strata sampled every-10th (rn ≡ 1 mod 10),
    // no eval docs (doc_id % 50 == 0) survive
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("rn") % 10 == 1))
    assert(rows.forall(_.getAs[Long]("doc_id") % 50 != 0))
  }

  test("property: unigramQuality scores are >= 1 (inverse probability bound)") {
    import org.scalacheck.Gen
    val corpusGen = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 6).flatMap(m =>
        Gen.listOfN(m, Gen.oneOf("a", "b", "c", "dd", "ee")).map(_.mkString(" ")))))
    check(org.scalacheck.Prop.forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      Curation.unigramQuality(df).select("score").as[Double].collect()
        .forall(_ >= 1.0 - 1e-9)
    })
  }
}
