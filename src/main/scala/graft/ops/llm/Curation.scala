package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity (north-star mandate): PII redaction, benchmark-
  * contamination detection, and statistical (unigram-LM) quality scoring.
  * Everything is codegen'd built-ins — regexp/split/explode/agg — with the
  * same oracle-determinism discipline as the rest of the inventory (exact
  * DECIMAL accumulation, explicit rounding before any compare/rank).
  */
object Curation {

  /** PII patterns applied IN ORDER (tag, regex, replacement). Order
    * matters and is part of the contract: emails and IPs are redacted
    * before the generic long-digit-run rule so their digit substrings
    * can't be half-eaten, and entity names before digit runs so
    * `Customer#000000042` becomes one `<NAME>`, not `Customer#<NUM>`.
    * The regexes stay inside the RE2 ∩ java.util.regex common subset
    * (no backreferences, no lookaround) so the DuckDB oracle replays
    * them verbatim.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"),
    ("name", "Customer#[0-9]+", "<NAME>"),
    ("num", "[0-9]{4,}", "<NUM>"))

  /** Scrub [[piiPatterns]] from `textCol`, sequentially; one `n_<tag>`
    * count column per pattern (matches counted on the text state right
    * before that pattern's own replacement — the count a redaction audit
    * log would record) plus the final `redacted` text. Pure per-row
    * projection: no shuffle, scales embarrassingly.
    */
  def piiRedact(df: DataFrame, textCol: String, idCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val (redacted, counts) =
      piiPatterns.foldLeft((col(textCol), Seq.empty[Column])) {
        case ((cur, cnts), (tag, pat, repl)) =>
          val n = size(regexp_extract_all(cur, lit(pat), lit(0))).cast("long").as(s"n_$tag")
          (regexp_replace(cur, pat, repl), cnts :+ n)
      }
    df.select((col(idCol) +: carryCols.map(col)) ++ counts :+ redacted.as("redacted"): _*)
  }

  /** One row per (carried columns, distinct `shingleLen`-gram hash). */
  private def distinctGrams(docs: DataFrame, shingleLen: Int, textCol: String,
      carryCols: Seq[Column]): DataFrame =
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .filter(size(col("__toks")) >= shingleLen)
      .select(carryCols :+ explode(expr(
        s"array_distinct(transform(sequence(0, size(__toks)-$shingleLen), i -> xxhash64(concat_ws(' ', slice(__toks, i+1, $shingleLen)))))")).as("__g"): _*)

  /** Benchmark-contamination check: count distinct shared token
    * `shingleLen`-grams between every corpus document and every document of
    * a (small) held-out evaluation set, and flag pairs with at least
    * `minShared` shared grams — the standard n-gram-overlap decontamination
    * step run before training. Grams travel as 8-byte xxhash64 keys; the
    * eval side is broadcast (an eval suite is bounded by construction —
    * thousands of docs, not billions), so the corpus side streams through
    * a map-side hash join with no shuffle of the corpus grams; only the
    * (doc, eval_doc) hit counts aggregate.
    */
  def contamination(docs: DataFrame, evalPred: Column, shingleLen: Int = 5,
      minShared: Int = 3, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val grams = distinctGrams(docs, shingleLen, textCol,
      Seq(col(idCol), evalPred.as("__is_eval")))
    val eval = grams.filter(col("__is_eval"))
      .select(col(idCol).as("eval_id"), col("__g"))
    val corpus = grams.filter(!col("__is_eval"))
      .select(col(idCol), col("__g"))
    corpus.join(broadcast(eval), Seq("__g"))
      .groupBy(idCol, "eval_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[contamination]] under Structured Streaming: a continuous document
    * ingest checked against a STATIC eval-set gram index (stream-static
    * broadcast join — the eval suite is fixed per training run). The
    * per-(doc, eval_doc) counts aggregate inside a `windowDuration`
    * event-time window with a `watermark` delay — two independent knobs:
    * the window sets grouping/emission granularity, the watermark sets how
    * much lateness is tolerated before state is dropped. Bounded memory on
    * unbounded input, same shape as [[Dedup.exactStreaming]]. Each
    * document's grams arrive in one row → one micro-batch, so its counts
    * are complete within its window.
    */
  def contaminationStreaming(docs: DataFrame, evalDocs: DataFrame,
      tsCol: String = "ts", watermark: String = "10 minutes",
      windowDuration: String = "10 minutes",
      shingleLen: Int = 5, minShared: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val evalGrams = distinctGrams(evalDocs, shingleLen, textCol,
      Seq(col(idCol).as("eval_id")))
    val streamGrams = distinctGrams(docs, shingleLen, textCol,
      Seq(col(idCol), col(tsCol)))
      .withWatermark(tsCol, watermark)
    streamGrams.join(broadcast(evalGrams), Seq("__g"))
      .groupBy(window(col(tsCol), windowDuration), col(idCol), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col(idCol), col("eval_id"), col("n_shared"))
  }

  /** Unigram-LM statistical quality score: the mean INVERSE corpus
    * probability of a document's tokens — high for documents made of rare
    * tokens, low for documents of ubiquitous ones (the log-free cousin of
    * unigram perplexity; chosen because every step is exact integer/IEEE
    * arithmetic that DuckDB replays bit-for-bit, where `ln` would hang the
    * oracle on libm ULP differences). Per token: N/cnt (exact IEEE double
    * division of two longs) rounded to 6dp; per doc: exact DECIMAL sum of
    * the rounded values / token count, rounded to 4dp. Two aggregations +
    * one vocabulary join (Zipf-bounded → AQE broadcasts it when small).
    */
  def unigramQuality(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("n"))
    val scored = toks.join(vocab, Seq("tok")).crossJoin(broadcast(total))
      .withColumn("__s", round(col("n").cast("double") / col("cnt"), 6))
    scored.groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        round(graft.Qh.dsum(col("__s")) / count(lit(1)), 4).as("score"))
  }
}
