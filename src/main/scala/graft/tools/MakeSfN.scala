package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend dataset builder: writes an N× copy of a testdata SF dir
  * with disjoint key spaces per copy, so the engine can be benchmarked one
  * decade above the driver's sf0.1 without touching the read-only
  * testdata (VERDICT r8 ask #2).
  *
  * Every copy shifts its keys by `copy · 10^7` (far above any real key),
  * preserving all FK relationships within the copy. Two columns are
  * perturbed per copy instead of duplicated, so the scale-up does not
  * fabricate cross-copy duplicates that would distort the dedup/similarity
  * workloads' scaling trend:
  *
  *  - `documents.text` (default `disjoint` text mode): every token gets a
  *    `_c` suffix in copy c>0 — shingle/token distributions (and each
  *    copy's internal dup structure) are preserved, but no shingle matches
  *    across copies;
  *  - `shared` text mode (4th arg): only the ~1/[[SharedSuffixMod]] of
  *    token TYPES whose content hash lands in the copy's class get the
  *    suffix, so most of the VOCABULARY is shared across copies — the
  *    realistic shape for vocabulary-keyed work (global token profiles,
  *    DF joins, posting lists), where the default disjoint build
  *    fabricates a `copies`-way vocabulary split that under-stresses
  *    every token-keyed shuffle and shrinks global-top-K outputs
  *    (VERDICT r13 #6: lang_id at sf10 classified 30/101 of docs).
  *    Trade-off, documented: cross-copy doc pairs share unsuffixed
  *    shingles (Jaccard ≈ 0.1-0.35 depending on hash-class overlap), so
  *    dedup/similarity scale trends MUST be probed on the default
  *    disjoint build — shared mode exists for the text tier only;
  *  - `embeddings.embedding`: one dimension per copy gets +0.35 — vectors
  *    stay near their label cluster but are not exact/cosine-1 duplicates
  *    of their origin.
  *
  * Usage: runMain graft.tools.MakeSfN <inDir> <outDir> [copies=10]
  *          [textMode=disjoint|shared] [tables=all|graph]
  *
  * `tables=graph` writes only the relational tables the derived property
  * graph is built from (region/nation/customer/supplier/part/orders/
  * lineitem) — the third-decade (sf100) graph probes need none of
  * documents/embeddings/events, and skipping them roughly halves the
  * build time and disk.
  */
object MakeSfN {

  /** Key-space stride between copies. */
  val Stride: Long = 10000000L

  /** In `shared` text mode, a token type is suffixed in copy c iff
    * `xxhash64(token) % SharedSuffixMod == c % SharedSuffixMod` — ~1/5 of
    * the vocabulary per copy, consistently by CONTENT (a token is either
    * always or never suffixed within a copy, so each copy's internal
    * shingle/dup structure is intact).
    */
  val SharedSuffixMod: Int = 5

  def main(args: Array[String]): Unit = {
    val inDir = args(0)
    val outDir = args(1)
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val textMode = args.lift(3).getOrElse("disjoint")
    require(textMode == "disjoint" || textMode == "shared",
      s"textMode must be disjoint|shared, got $textMode")
    val tableSet = args.lift(4).getOrElse("all")
    require(Set("all", "graph", "llm").contains(tableSet),
      s"tables must be all|graph|llm, got $tableSet")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    def expand(df: DataFrame, shiftCols: Seq[String]): DataFrame = {
      val copied = df.crossJoin(broadcast(
        spark.range(copies).toDF("__c")))
      shiftCols.foldLeft(copied)((d, k) =>
        d.withColumn(k, col(k) + col("__c") * Stride))
    }

    def write(df: DataFrame, name: String): Unit = {
      df.drop("__c").write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[makesf] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    // `llm` writes only documents/embeddings — the third-decade text/dedup/
    // similarity probes read nothing else, and the relational tables are
    // ~90% of the bytes at the sf100 tier (VERDICT r14 #5)
    if (tableSet != "llm") {
      // fixed dimensions: copy through unchanged
      for (t <- Seq("region", "nation"))
        write(spark.read.parquet(s"$inDir/$t.parquet"), t)

      write(expand(spark.read.parquet(s"$inDir/customer.parquet"), Seq("c_custkey")), "customer")
      write(expand(spark.read.parquet(s"$inDir/supplier.parquet"), Seq("s_suppkey")), "supplier")
      write(expand(spark.read.parquet(s"$inDir/part.parquet"), Seq("p_partkey")), "part")
      write(expand(spark.read.parquet(s"$inDir/orders.parquet"),
        Seq("o_orderkey", "o_custkey")), "orders")
      write(expand(spark.read.parquet(s"$inDir/lineitem.parquet"),
        Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
      if (tableSet == "graph") { spark.stop(); return }

      // events: read via Tables (nanos → µs), shift ids; ts unchanged — N×
      // the event rate over the same window, which is what a scale-up means
      write(expand(graft.model.Tables(spark, inDir, "events"),
        Seq("event_id", "user_id")), "events")
    }

    val suffixed =
      if (textMode == "shared")
        // suffix only the copy's hash class of token types — shared
        // vocabulary across copies, per-copy structure intact
        expr(s"""array_join(transform(split(text, ' '), w ->
          IF(pmod(xxhash64(w), $SharedSuffixMod) = __c % $SharedSuffixMod,
             concat(w, '_', __c), w)), ' ')""")
      else
        array_join(transform(split(col("text"), " "),
          w => concat(w, lit("_"), col("__c"))), " ")
    val docs = expand(spark.read.parquet(s"$inDir/documents.parquet"), Seq("doc_id"))
      .withColumn("text", when(col("__c") === 0, col("text")).otherwise(suffixed))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(docs, "documents")

    // Copies 64+ would land on an already-used dimension (7c mod 64 has
    // period 64), making copy c and c+64 EXACT duplicates — fabricated
    // cross-copy dup pairs that would distort the similarity/dedup scale
    // trend at copies>64 (the sf10 build). The perturbation is therefore
    // LAP-dependent (lap = c div 64): sign alternates with lap parity and
    // magnitude grows 0.35 per sign cycle, so every lap writes a DISTINCT
    // value into its shared dimension — lap 0 +0.35, lap 1 −0.35, lap 2
    // +0.70, lap 3 −0.70, … — and no two copies at ANY copy count can
    // alias (the r12 fixed sign flip re-aliased at lap 2, i.e. the sf100
    // build). Laps 0-1 are byte-identical to the historical sf1/sf10
    // builds; same-dimension cross-lap copies stay at cosine ~0.7, below
    // every near-dup threshold.
    val emb = expand(spark.read.parquet(s"$inDir/embeddings.parquet"), Seq("vec_id"))
      .withColumn("embedding", when(col("__c") === 0, col("embedding")).otherwise(
        expr(s"transform(embedding, (x, j) -> CAST(x + IF(j = CAST(__c * 7 % 64 AS INT), " +
          "CAST((0.35 + 0.35 * CAST(__c DIV 128 AS INT)) * " +
          "IF((__c DIV 64) % 2 = 0, 1.0, -1.0) AS FLOAT), " +
          "CAST(0.0 AS FLOAT)) AS FLOAT))")))
    write(emb, "embeddings")

    spark.stop()
  }
}
