package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHash
import graft.ops.llm.Dedup

/** PolyFold must be bit-identical to the HOF form it replaces — the DuckDB
  * oracle replays THAT arithmetic, so any divergence would silently break
  * minhash/simhash oracle parity.
  */
class TextHashSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    "", "a", "the quick brown fox", "tok1 tok2 tok3",
    "unicode: héllo wörld", "emoji: 😀 pair", // surrogate pair
    "numbers 12345 and punct !?;")

  test("poly_fold equals the aggregate/transform/split HOF form on every sample") {
    val df = samples.toDF("s")
    val rows = df.select(
      TextHash.poly_fold(col("s"), Dedup.P).as("fast"),
      expr(Dedup.polyFoldExpr("s")).as("hof")).collect()
    rows.zip(samples).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1), s"fold mismatch for '$s'")
    }
  }

  test("poly_fold survives the interpreted path (codegen off) identically") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got = samples.toDF("s")
        .select(TextHash.poly_fold(col("s"), Dedup.P)).as[Long].collect().toSeq
      val want = samples.map(s =>
        s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % Dedup.P))
      assert(got == want)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("null input folds to null") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(TextHash.poly_fold(col("s"), Dedup.P)).collect()
    assert(r.head.isNullAt(0))
  }

  test("bigram_hashes equals xxhash64 over the composable distinct-concat form") {
    val cases = samples ++ Seq(
      "a b", "a b a b", "double  space", " leading", "trailing ", "   ",
      "one", "a b c d e f g", "répé té répé té", "😀 x 😀 x")
    val df = cases.toDF("s")
    val fast = df.select(col("s"),
      TextHash.bigram_hashes(col("s")).as("h")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    val slow = df
      .withColumn("__toks", split(col("s"), " "))
      .select(col("s"),
        when(size(col("__toks")) >= 2, expr(
          "transform(array_distinct(transform(sequence(0, size(__toks)-2), " +
            "i -> concat(__toks[i], ' ', __toks[i+1]))), g -> xxhash64(g))"))
          .otherwise(typedlit(Seq.empty[Long])).as("h"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    cases.foreach { s =>
      assert(fast(s) == slow(s), s"bigram hash mismatch for '$s'")
    }
  }

  test("poly_fold is callable from SQL with an INT-sized literal modulus") {
    // P = 1000000007 fits in Int, so the SQL literal evaluates to a boxed
    // Integer — the exact case the shared builder must widen, not cast.
    TextHash.register(spark)
    val viaSql = spark.sql(
      s"SELECT poly_fold('the quick brown fox', ${Dedup.P}) AS h")
      .head().getLong(0)
    val viaApi = Seq("the quick brown fox").toDF("s")
      .select(TextHash.poly_fold(col("s"), Dedup.P)).head().getLong(0)
    assert(viaSql == viaApi)
    // BIGINT-typed modulus works too
    val viaSqlLong = spark.sql(
      s"SELECT poly_fold('abc', CAST(${Dedup.P} AS BIGINT)) AS h").head().getLong(0)
    assert(viaSqlLong == Seq("abc").toDF("s")
      .select(TextHash.poly_fold(col("s"), Dedup.P)).head().getLong(0))
    // non-foldable modulus fails analysis loudly
    val err = intercept[Exception] {
      Seq(("x", 7L)).toDF("s", "m").createOrReplaceTempView("pf_in")
      spark.sql("SELECT poly_fold(s, m) FROM pf_in").collect()
    }
    assert(err.getMessage.contains("foldable"))
    // fractional modulus is rejected, never silently truncated
    val frac = intercept[Exception] {
      spark.sql("SELECT poly_fold('x', CAST(7.5 AS DOUBLE))").collect()
    }
    assert(frac.getMessage.contains("integral"))
    // integral DECIMAL literals (the SQL default for 7.0-style numbers) work
    val viaDec = spark.sql("SELECT poly_fold('abc', 97.0) AS h").head().getLong(0)
    assert(viaDec == Seq("abc").toDF("s")
      .select(TextHash.poly_fold(col("s"), 97L)).head().getLong(0))
  }
}
