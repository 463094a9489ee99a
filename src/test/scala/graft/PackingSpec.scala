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

  test("chunkDocs plan: ZERO exchanges — the zero-shuffle claim, pinned") {
    val plan = Packing.chunkDocs(docsOf((1L, "a b c d e")), 4, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunkDocs must not shuffle:\n$plan")
  }

  test("chunkDocs: stride layout, full coverage, lossless reconstruction") {
    // 10 tokens, chunkSize 4, overlap 1 (stride 3) → chunks at 0, 3, 6;
    // a 4th window at 9 would add no new token (9 ≥ n - overlap) so it
    // must NOT be emitted.
    val docs = docsOf((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
    val rows = Packing.chunkDocs(docs, chunkSize = 4, overlap = 1)
      .orderBy("chunk_id")
      .select("chunk_id", "chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(rows.map(r => (r._1, r._2, r._3)) ==
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L)))
    assert(rows.head._4 == "t0 t1 t2 t3")
    // dropping each later chunk's overlap prefix reconstructs the doc
    val rebuilt = (rows.head._4 +: rows.tail.map(_._4.split(" ").drop(1).mkString(" ")))
      .mkString(" ")
    assert(rebuilt == (0 until 10).map(i => s"t$i").mkString(" "))
  }

  test("chunkDocs: short docs yield one chunk; coverage is exact at every length") {
    val docs = docsOf((1L to 20L).map(i => (i, (0 until i.toInt).map(j => s"w$j").mkString(" "))): _*)
    val chunks = Packing.chunkDocs(docs, chunkSize = 8, overlap = 2)
      .select("doc_id", "chunk_id", "chunk_start", "n_chunk_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // every doc's final chunk must end exactly at its token count, chunks
    // never exceed the size, and every chunk past the first adds tokens
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val n = id // doc i has i tokens
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0L)
      assert(sorted.last._3 + sorted.last._4 == n, s"doc $id end mismatch")
      sorted.foreach { c => assert(c._4 >= 1 && c._4 <= 8) }
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._3 == a._3 + 6, s"doc $id stride broken")
          assert(b._3 + b._4 > a._3 + a._4, s"doc $id chunk ${b._2} adds no tokens")
        case _ =>
      }
    }
  }
}
