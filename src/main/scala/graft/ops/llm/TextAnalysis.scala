package graft.ops.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation (north-star mandate):
  * token statistics, quality scoring, BPE-style token counting, n-gram
  * language ID, and rolling-hash document fingerprinting. Everything is
  * built from codegen'd built-ins (`split`/`explode`/HOFs/window) — no UDFs.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** One row per (doc, token). */
  def tokens(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("tok"))

  /** Top-k most frequent tokens per language. */
  def topTermsPerLang(docs: DataFrame, k: Int = 5): DataFrame = {
    val counts = docs.select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
    counts.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
      .select("lang", "rk", "tok", "cnt")
  }

  /** Per-document quality features: token count, chars/token, stopword
    * ratio, punctuation count — the standard cheap quality heuristics.
    */
  def quality(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val stopList = stopwords.map(s => s"'$s'").mkString(", ")
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("chars_per_token", col("n_chars").cast("double") / col("n_tokens"))
      .withColumn("n_stop", expr(s"CAST(size(filter(__toks, t -> t IN ($stopList))) AS BIGINT)"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .withColumn("n_punct",
        length(regexp_replace(col(textCol), "[a-z0-9 ]", "")).cast("long"))
      .select(idCol, "n_tokens", "chars_per_token", "n_stop", "stop_ratio", "n_punct")
  }

  /** BPE-ish pre-tokenizer count: runs of letters, runs of digits, or
    * single other non-space chars — the GPT-2-style pre-tokenization
    * granularity, as a regex.
    */
  def bpeTokenCount(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      expr(s"CAST(size(regexp_extract_all($textCol, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS BIGINT)")
        .as("n_bpe_tokens"))

  /** Two-pass n-gram(token) language ID: fit per-language profiles (top-N
    * tokens, rank-weighted) from a labeled corpus, then classify each doc
    * by weighted token votes. The profile is tiny → broadcast join; the
    * votes are one shuffle on (doc, lang).
    */
  def langId(docs: DataFrame, topN: Int = 30): DataFrame = {
    val toks = docs.select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
    val w = Window.partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
    val profile = toks.groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= topN)
      .select(col("lang").as("p_lang"), col("tok"), (lit(topN + 1) - col("rk")).as("weight"))
    val votes = toks.join(broadcast(profile), Seq("tok"))
      .groupBy("doc_id", "lang", "p_lang").agg(sum("weight").as("score"))
    val w2 = Window.partitionBy("doc_id").orderBy(col("score").desc, col("p_lang"))
    votes.withColumn("rk", row_number().over(w2)).filter(col("rk") === 1)
      .select(col("doc_id"), col("p_lang").as("pred_lang"),
        (col("p_lang") === col("lang")).as("correct"))
  }

  /** Winnowing document fingerprint: rolling shingle hashes, minimum per
    * sliding window of `winnow` — the MOSS scheme (Schleimer, Wilkerson,
    * Aiken, "Winnowing: local algorithms for document fingerprinting",
    * SIGMOD 2003). Output: fingerprint-set summary per doc.
    *
    * The shingle hash is a char-code polynomial fold
    * (h = fold(0, (a,c) → (a·31 + ascii(c)) mod 1e9+7)) rather than
    * xxhash64: DuckDB can replay the identical fold
    * (`list_reduce(list_prepend(0, codes), …)`), which makes the whole
    * winnowing pipeline oracle-checkable end to end. Swap `polyHash=false`
    * for the codegen'd xxhash64 fast path when verifiability isn't needed
    * (the winnowing algebra — shingle windows, minima, distinct — is
    * identical either way).
    */
  def fingerprint(docs: DataFrame, shingleLen: Int = 3, winnow: Int = 4,
      textCol: String = "text", idCol: String = "doc_id",
      polyHash: Boolean = true): DataFrame = {
    val shingleStr = s"concat_ws(' ', slice(__toks, i+1, $shingleLen))"
    // single source of truth for the fold (and its modulus): Dedup.polyFoldExpr
    val hashOfShingle =
      if (polyHash) Dedup.polyFoldExpr(shingleStr)
      else s"xxhash64($shingleStr)"
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .filter(size(col("__toks")) >= shingleLen + winnow - 1)
      .withColumn("__hs", expr(
        s"transform(sequence(0, size(__toks)-$shingleLen), i -> $hashOfShingle)"))
      .withColumn("__fps", expr(
        s"array_distinct(transform(sequence(0, size(__hs)-$winnow), i -> array_min(slice(__hs, i+1, $winnow))))"))
      .select(col(idCol), size(col("__fps")).cast("long").as("n_fingerprints"),
        array_min(col("__fps")).as("min_fingerprint"))
  }
}
