package graft

import org.apache.spark.sql.functions._
import graft.ops.Bloom

/** Bloom filter contract: zero false negatives ever, false-positive rate
  * near theory at a deliberately undersized geometry, OR-merge equals the
  * union build, layout invariance, and the words-bounded size.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Long) = spark.range(n)
    .select((col("id") * 7919L + 3L).as("key"))

  test("no false negatives: every built key passes mightContain") {
    val k = keys(2000).cache()
    val bloom = Bloom.build(k, "key")
    assert(Bloom.mightContain(k, bloom, "key").count() == 2000)
  }

  test("false-positive rate near theory on an undersized filter") {
    // unstructured keys (hashed ids): affine-stride key sets can alias a
    // tiny power-of-two bit space and set every bit, which tests nothing
    val k = spark.range(300).select(xxhash64(col("id")).as("key")).cache()
    // tiny geometry: 32 words x 32 bits = 1024 bits, k=3 probes ->
    // load kn/m ~ 0.88, per-bit fill 1-e^-0.88 ~ 0.59, fp ~ 0.2
    val bloom = Bloom.build(k, "key", words = 32, k = 3)
    val probes = spark.range(1000, 9000)
      .select(xxhash64(col("id")).as("key"))
    val passed = Bloom.mightContain(probes, bloom, "key", words = 32, k = 3).count()
    val rate = passed.toDouble / 8000
    assert(rate > 0.02 && rate < 0.6, s"fp rate $rate out of plausible band")
  }

  test("merge by word-wise OR equals the union build; layout-invariant") {
    val a = keys(1500).filter(col("key") % 2 === 1)
    val b = keys(1500).filter(col("key") % 2 =!= 1)
    val whole = Bloom.build(a.unionAll(b), "key").orderBy("word_idx").collect().toSeq
    val merged = Bloom.build(a, "key").unionAll(Bloom.build(b, "key"))
      .groupBy("word_idx").agg(expr("bit_or(word)").as("word"))
      .orderBy("word_idx").collect().toSeq
    assert(merged == whole)
    val shuffled = Bloom.build(a.unionAll(b).repartition(13), "key")
      .orderBy("word_idx").collect().toSeq
    assert(shuffled == whole)
  }

  test("filter size is words-bounded and duplicate keys change nothing") {
    val k = keys(3000)
    val bloom = Bloom.build(k, "key").cache()
    assert(bloom.count() <= Bloom.BloomWords)
    val dup = Bloom.build(k.unionAll(k).unionAll(k), "key")
      .orderBy("word_idx").collect().toSeq
    assert(dup == bloom.orderBy("word_idx").collect().toSeq)
  }
}
