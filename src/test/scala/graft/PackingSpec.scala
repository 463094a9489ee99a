package graft

import org.apache.spark.sql.functions._
import graft.ops.llm.Packing

/** Sequence packing: budget/coverage invariants, determinism under
  * repartitioning (the two-level prefix sum must be a pure function of the
  * data), and span arithmetic at the chunk boundaries.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("every sequence except the last is exactly full; none over budget") {
    val docs = docsOf((1L, "a b c"), (2L, "d e f g h"), (3L, "i"),
      (4L, "j k l m n o p q"), (5L, "r s"))
    // 19 tokens, budget 4 → seqs 0..4 hold 4 tokens each, seq 4 holds 3
    val packed = Packing.packSequences(docs, budget = 4)
    val perSeq = packed.groupBy("seq_id").agg(sum("n_toks_in_seq").as("n"))
      .as[(Long, Long)].collect().toMap
    val lastSeq = perSeq.keys.max
    perSeq.foreach { case (seq, n) =>
      if (seq == lastSeq) assert(n <= 4 && n > 0)
      else assert(n == 4L, s"seq $seq holds $n != budget")
    }
    assert(perSeq.values.sum == 19L)
  }

  test("every doc is packed exactly once: its spans sum to its token count") {
    val docs = docsOf((1L, "a b c"), (2L, "d e f g h"), (3L, "i"),
      (4L, "j k l m n o p q"), (5L, "r s"))
    val got = Packing.packSequences(docs, budget = 4)
      .groupBy("doc_id").agg(sum("n_toks_in_seq").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 5L, 3L -> 1L, 4L -> 8L, 5L -> 2L))
  }

  test("spans are contiguous: seq_off + previous spans line up at boundaries") {
    // doc 4 (8 tokens) starts at global offset 9 → spans seqs 2,3,4 with
    // offsets/lengths (1,3), (0,4), (0,1) under budget 4
    val docs = docsOf((1L, "a b c"), (2L, "d e f g h"), (3L, "i"),
      (4L, "j k l m n o p q"))
    val spans = Packing.packSequences(docs, budget = 4)
      .filter(col("doc_id") === 4L).orderBy("seq_id")
      .select("seq_id", "seq_off", "n_toks_in_seq")
      .as[(Long, Long, Long)].collect().toSeq
    assert(spans == Seq((2L, 1L, 3L), (3L, 0L, 4L), (4L, 0L, 1L)))
  }

  test("zero/NULL-token docs are dropped, not packed as empty spans") {
    val docs = Seq((1L, "a b"), (2L, null.asInstanceOf[String]), (3L, "c"))
      .toDF("doc_id", "text")
    val got = Packing.packSequences(docs, budget = 8)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("layout-invariant: same packing for any input partitioning and rangeSize") {
    val docs = (1L to 200L).map(i => (i, ("w " * (i % 13 + 1).toInt).trim)).toDF("doc_id", "text")
    val base = Packing.packSequences(docs, budget = 32)
      .orderBy("doc_id", "seq_id").collect().toSeq
    val shuffled = Packing.packSequences(docs.repartition(7), budget = 32)
      .orderBy("doc_id", "seq_id").collect().toSeq
    val otherRange = Packing.packSequences(docs, budget = 32, rangeSize = 17L)
      .orderBy("doc_id", "seq_id").collect().toSeq
    assert(base == shuffled)
    assert(base == otherRange)
  }
}
