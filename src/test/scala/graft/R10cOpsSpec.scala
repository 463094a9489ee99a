package graft

import org.apache.spark.sql.functions._

/** Unit specs for the round-10b operators (bm25_retrieval, ngram_pmi,
  * mask_spans, split_holdout, rfm_segment, graph_rich_club). Oracle
  * parity at sf0.01 is the correctness gate; these pin SEMANTICS on
  * hand-built corpora where the expected values are recomputed by an
  * independent plain-Scala reimplementation (or knowable by eye).
  */
class R10cOpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r10c").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("bm25_retrieval matches an independent fixed-point reimplementation") {
    // vocab ranks by (cnt desc, tok): w1=10 → r1, w2=7 → r2, w3=7 → r3,
    // w4=w5=w6=w7=4 → r4..r7, w8=3 → r8. Terms = rank 3 (w3), rank 7 (w7).
    val docs = Seq(
      (0L, "w1 w1 w1 w1 w3 w3 w3 w7", "s0"),
      (1L, "w1 w1 w2 w2 w3 w7 w7", "s0"),
      (2L, "w1 w2 w3 w4 w5 w6", "s1"),
      (3L, "w1 w2 w2 w4 w4 w5 w6 w8", "s1"),
      (4L, "w1 w2 w3 w3 w5 w6 w8", "s1"),
      (5L, "w1 w2 w4 w5 w6 w7 w8", "s1"))
    val dir = writeDocs(docs)
    // independent replay of the declared integer formula
    val toks = docs.map { case (id, t, s) => (id, s, t.split(" ").toSeq) }
    val n = toks.size.toLong
    val sTot = toks.map(_._3.size.toLong).sum
    val dfOf = Map("w3" -> 4L, "w7" -> 3L)
    def score(id: Long): (Long, Long) = {
      val (_, _, ts) = toks.find(_._1 == id).get
      val dl = ts.size.toLong
      val terms = Seq("w3", "w7").flatMap { w =>
        val tf = ts.count(_ == w).toLong
        if (tf == 0) None else {
          val df = dfOf(w)
          val k6 = 300000L + (900000L * dl * n) / sTot
          val tfc6 = (tf * 2200000L * 1000000L) / (tf * 1000000L + k6)
          val idf6 = ((2 * n - 2 * df + 1) * 1000000L) / (2 * df + 1)
          Some(tfc6 * idf6 / 1000000L)
        }
      }
      (terms.sum, terms.size.toLong)
    }
    val expected = Seq(0L, 1L, 2L, 4L, 5L)
      .map(id => (id, score(id))).map { case (id, (s6, nt)) => (id, s6, nt) }
      .sortBy { case (id, s6, _) => (-s6, id) }
    val got = SparkEntry.queries("bm25_retrieval")(spark, dir)
      .select("doc_id", "score6", "n_terms").as[(Long, Long, Long)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("ngram_pmi: hand-computed collocation ranks on a 2-doc corpus") {
    // doc0 bigrams: (x,y) (y,x) (x,y); doc1: (z,w). T=4.
    // pmi6(x,y) = 2e6 div max((2·2) div 4, 1) = 2e6
    // pmi6(y,x) = 1e6 div max((1·1) div 4, 1) = 1e6 (den floor-guarded)
    // pmi6(z,w) = 1e6; tie → (tok, nxt) order puts (y,x) before (z,w)
    val dir = writeDocs(Seq((0L, "x y x y", "s0"), (1L, "z w", "s0")))
    val got = SparkEntry.queries("ngram_pmi")(spark, dir)
      .select("tok", "nxt", "c_ab", "pmi6").as[(String, String, Long, Long)]
      .collect().toSeq
    assert(got == Seq(("x", "y", 2L, 2000000L), ("y", "x", 1L, 1000000L),
      ("z", "w", 1L, 1000000L)))
  }

  test("mask_spans: run collapse, counts, and text match a plain replay") {
    import graft.ops.llm.Shuffle
    val texts = Seq((0L, "a b c d e f g h i j k l", "s0"),
      (7L, "p q r s t u v w", "s0"))
    val dir = writeDocs(texts)
    def replay(id: Long, text: String): (Long, Long, Long, String) = {
      val ts = text.split(" ")
      val m = ts.indices.map(p =>
        (Shuffle.A * (id * 1000 + p) + Shuffle.B) % Shuffle.P % 100 < 15)
      val out = scala.collection.mutable.Buffer[String]()
      var spans = 0L
      ts.indices.foreach { p =>
        if (!m(p)) out += ts(p)
        else if (p == 0 || !m(p - 1)) { out += "<X>"; spans += 1 }
      }
      (ts.length.toLong, m.count(identity).toLong, spans, out.mkString(" "))
    }
    val expected = texts.map { case (id, t, _) =>
      val (nt, nm, ns, mt) = replay(id, t); (id, nt, nm, ns, mt)
    }
    val got = SparkEntry.queries("mask_spans")(spark, dir)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // the fixture must actually exercise masking (else the test is vacuous)
    assert(got.map(_._3).sum > 0)
  }

  test("split_holdout: all three splits populated, shares and counts consistent") {
    val got = SparkEntry.queries("split_holdout")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // the mod-100 aliasing regression left val empty — 3 rows is the guard
    assert(got.map(_._1).sorted.toSeq == Seq("test", "train", "val"))
    val n = got.map(_._2).sum
    assert(n == 500L)
    val train = got.find(_._1 == "train").get
    assert(train._2 > n * 8 / 10, s"train share too small: ${train._2}/$n")
    got.foreach { case (_, nd, _, minB, maxB, ppm) =>
      assert(minB >= 0 && maxB <= 96)
      assert(ppm == nd * 1000000L / n)
    }
  }

  test("rfm_segment: digit ranges, customer conservation, exact cents total") {
    val d = "/root/testdata/sf0.001"
    val seg = SparkEntry.queries("rfm_segment")(spark, d)
      .as[(Long, Long, Long)].collect()
    val orders = Qh.t(spark, d, "orders")
    val nCust = orders.select("o_custkey").distinct().count()
    assert(seg.map(_._2).sum == nCust)
    seg.foreach { case (code, _, _) =>
      val (r, f, m) = (code / 100, code / 10 % 10, code % 10)
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5, s"code $code")
    }
    val totalCents = orders
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) * 100).cast("long"))
      .as[Long].head()
    assert(seg.map(_._3).sum == totalCents)
  }

  test("sketch_hll_intersect: inclusion-exclusion calibrates within bound at gate SF") {
    val d = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("sketch_hll_intersect")(spark, d)
      .as[(Long, Long, Long, Double, Double, Double, Double, Double, Boolean)]
      .collect().head
    val (nA, nB, nInter, estA, estB, estU, estInter, absErr, within) = r
    // exact columns recomputed directly
    val li = Qh.t(spark, d, "lineitem")
    val ux = li.groupBy("l_partkey").agg(
      max(when(col("l_quantity") <= 2, 1L).otherwise(0L)).as("ia"),
      max(when(col("l_quantity") >= 49, 1L).otherwise(0L)).as("ib"))
    val (eA, eB, eI) = ux.agg(sum("ia"), sum("ib"), sum(col("ia") * col("ib")))
      .as[(Long, Long, Long)].head()
    assert((nA, nB, nInter) == ((eA, eB, eI)))
    // set algebra sanity on the estimates; the overlap must be PARTIAL
    assert(estU <= estA + estB + 1e-9)
    assert(estInter == BigDecimal(estA + estB - estU)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(nInter < nA && nInter < nB && nInter > 0, "fixture overlap degenerate")
    assert(absErr == BigDecimal(math.abs(estInter - nInter))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // at gate SF the sets are in HLL's raw range -> the bound must hold
    assert(within, s"calibration out of bound: est $estInter vs exact $nInter")
  }

  private def writeEvents(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r10cev").toString
    rows.map { case (id, ts, u, et, v) => (id, ts, u, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts_autocorr: alternating series gives r = -1 at lag 1, +1 at lag 2") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var id = 0L
    val rows = for {
      m <- 0 until 60
      cnt = if (m % 2 == 0) 10 else 20
      _ <- 0 until cnt
    } yield {
      id += 1
      (id, new java.sql.Timestamp(t0.getTime + m * 60000L), 1L, "click", 1.0)
    }
    val dir = writeEvents(rows)
    val got = SparkEntry.queries("ts_autocorr")(spark, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got(0)._3 == -1.0 && got(1)._3 == 1.0 && got(2)._3 == -1.0, s"$got")
    assert(got.map(_._2) == Seq(59L, 58L, 57L))
  }

  test("ts_changepoint: CUSUM peaks at the level-shift boundary") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    var id = 0L
    val rows = for {
      m <- 0 until 60
      cnt = if (m < 30) 10 else 20
      _ <- 0 until cnt
    } yield {
      id += 1
      (id, new java.sql.Timestamp(t0.getTime + m * 60000L), 1L, "click", 1.0)
    }
    val dir = writeEvents(rows)
    val (cp, nb, tot, peak) = SparkEntry.queries("ts_changepoint")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().head
    val base = t0.getTime / 60000L // minute index of the series start (UTC)
    assert(cp == base + 29, s"changepoint at $cp, expected ${base + 29}")
    assert(nb == 60L && tot == 900L)
    // cusum_t at the pre-shift trough: 30 buckets x (60*10 - 900) = -9000
    assert(peak == 9000L)
  }

  test("sketch_join_cardinality: exact F2, one-sided estimate, bound holds") {
    // key i appears i times, i = 1..10: self-join size = sum i^2 = 385
    val dir = java.nio.file.Files.createTempDirectory("r10cj").toString
    (1 to 10).flatMap(i => Seq.fill(i)(i.toLong))
      .map(k => (k, k, 1.0, "N"))
      .toDF("l_partkey", "l_orderkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val (nRows, nKeys, exact, est, over, within) =
      SparkEntry.queries("sketch_join_cardinality")(spark, dir)
        .as[(Long, Long, Long, Long, Long, Boolean)].collect().head
    assert(nRows == 55L && nKeys == 10L && exact == 385L)
    assert(over >= 0L, "CMS inner product must never undercount")
    assert(est == exact + over)
    assert(within, s"overcount $over exceeds the eps*N^2 bound")
  }

  test("multimodal_scene_cut: deltas match a direct pixel-formula replay") {
    import graft.ops.llm.Multimodal
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("multimodal_scene_cut")(spark, d)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.nonEmpty)
    // independent replay straight from the synthesis formulas
    val expected = Qh.t(spark, d, "documents").select("doc_id").as[Long].collect()
      .filter(_ % 3 == 2).sorted.toSeq.flatMap { id =>
        val (w, h, f) = Multimodal.videoDims(id)
        val sums = (0 until f).map(fi =>
          (0 until w * h * 3).map(j => Multimodal.pxVal(id, fi, j).toLong).sum)
        (1 until f).map { fi =>
          val delta = math.abs(sums(fi) - sums(fi - 1))
          (id, fi.toLong, delta, delta > 8L * w * h * 3)
        }
      }
    assert(got == expected)
    // both classes must occur or the threshold is vacuous on this fixture
    assert(got.exists(_._4) && got.exists(!_._4), "threshold never separates")
  }

  test("ts_seasonality: conservation, hour domain, uniform-mean index") {
    val got = SparkEntry.queries("ts_seasonality")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect()
    assert(got.forall(r => r._1 >= 0 && r._1 <= 23))
    assert(got.map(_._2).sum == 1000L) // sf0.001 events row count
    val total = got.map(_._2).sum
    got.foreach { case (_, n, ppm) => assert(ppm == n * 24 * 1000000L / total) }
  }

  test("table_diff_digest: identical replicas diff empty; drift localizes to its bucket") {
    val ts = java.sql.Timestamp.valueOf("1995-06-01 00:00:00")
    // keys 1..5 (bucket 0, untouched — must NOT appear in the diff),
    // 97 (bucket 1, cents-patched → content), 202 = 2*101 (bucket 3,
    // deleted; the bucket's only row, so the bucket disappears → only_a)
    val keys = Seq(1L, 2L, 3L, 4L, 5L, 97L, 202L)
    val dir = java.nio.file.Files.createTempDirectory("r10cd").toString
    keys.map(k => (k, k % 7, "O", 100.0 + k, ts, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("table_diff_digest")(spark, dir)
      .select("bucket", "change").as[(Long, String)].collect().toSeq
    assert(got == Seq(1L -> "content", 3L -> "only_a"), s"got $got")
  }

  test("negative_sampling: draws replay the hash, false negatives flagged not dropped") {
    import graft.ops.llm.Shuffle
    val dir = java.nio.file.Files.createTempDirectory("r10cn").toString
    // customers 1,2 each order parts {1,2} via two orders; parts 1..4
    Seq((10L, 1L), (11L, 2L)).map { case (o, c) => (o, c, "O", 1.0,
      java.sql.Timestamp.valueOf("1995-06-01 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L))
      .map { case (o, p) => (o, p, 1.0, "N") }
      .toDF("l_orderkey", "l_partkey", "l_quantity", "l_returnflag")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (1L to 4L).map(p => (p, s"part$p", 1)).toDF("p_partkey", "p_name", "p_size")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val pos = Map(1L -> Set(1L, 2L), 2L -> Set(1L, 2L))
    val expected = for (c <- Seq(1L, 2L); k <- 1L to 4L) yield {
      val p = (Shuffle.A * (c * 131 + k) + Shuffle.B) % Shuffle.P % 4 + 1
      (c, k, p, !pos(c).contains(p))
    }
    val got = SparkEntry.queries("negative_sampling")(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == expected, s"got $got\nexpected $expected")
    // the 4-part universe guarantees both classes appear
    assert(got.exists(_._4) && got.exists(!_._4))
  }

  test("bootstrap_ci matches a plain-Scala Poisson-bootstrap replay") {
    import graft.ops.llm.Shuffle
    val dir = java.nio.file.Files.createTempDirectory("r10cb").toString
    // one group, rows (orderkey i, linenumber 1), x = i, i = 1..40
    val rows = (1 to 40).map(i => (i.toLong, 1L, i.toDouble, "N", 1L))
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    def weight(key: Long, r: Long): Long = {
      val h = (Shuffle.A * (key * 37 + r) + Shuffle.B) % Shuffle.P % 1000
      if (h < 368) 0 else if (h < 736) 1 else if (h < 920) 2
      else if (h < 981) 3 else if (h < 996) 4 else if (h < 999) 5 else 6
    }
    val means = (0L until 32L).flatMap { r =>
      val ws = rows.map { case (ok, ln, x, _, _) => (weight(ok * 8 + ln, r), x) }
      val wn = ws.map(_._1).sum
      if (wn == 0) None
      else Some((r, ws.map { case (w, x) => BigDecimal(x).setScale(6) * w }.sum.toDouble / wn))
    }
    val sorted = means.sortBy { case (r, m) => (m, r) }.map(_._2)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (expLo, expHi) = (r6(sorted(1)), r6(sorted(sorted.size - 2)))
    val (grp, n, meanX, nRes, lo, hi) =
      SparkEntry.queries("bootstrap_ci")(spark, dir)
        .as[(String, Long, Double, Long, Double, Double)].collect().head
    assert(grp == "N" && n == 40L && nRes == means.size.toLong)
    assert(meanX == r6((1 to 40).sum.toDouble / 40))
    assert((lo, hi) == ((expLo, expHi)), s"got ($lo,$hi) expected ($expLo,$expHi)")
    assert(lo < hi && lo <= meanX && meanX <= hi)
  }

  test("graph_eccentricity: consistent with the shared BFS siblings") {
    val d = "/root/testdata/sf0.001"
    val ecc = SparkEntry.queries("graph_eccentricity")(spark, d)
      .as[(Long, Long, Long, Long)].collect()
    assert(ecc.nonEmpty)
    val dia = ecc.map(_._2).max
    ecc.foreach { case (_, e, nr, dlb) =>
      assert(e >= 1 && e <= 10, s"ecc $e outside the BFS bound")
      assert(dlb == dia, "diameter_lb must be the max eccentricity")
      assert(nr > 1)
    }
    // same traversal as closeness -> identical per-landmark reach counts
    val reach = SparkEntry.queries("graph_closeness")(spark, d)
      .select("landmark", "n_reached").as[(Long, Long)].collect().toMap
    ecc.foreach { case (l, _, nr, _) => assert(reach(l) == nr) }
  }

  test("graph_rich_club: monotone ladder, phi within [0, 1e6]") {
    val got = SparkEntry.queries("graph_rich_club")(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Option[Long])].collect()
    assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq)
    // higher threshold → subset of nodes and edges
    got.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(hi._2 <= lo._2, s"nodes not monotone: $lo $hi")
        assert(hi._3 <= lo._3, s"edges not monotone: $lo $hi")
      case _ =>
    }
    got.foreach { case (_, nn, ne, phi) =>
      phi.foreach(p => assert(p >= 0 && p <= 1000000L, s"phi $p"))
      if (nn > 1) assert(phi.isDefined)
      assert(ne <= nn * (nn - 1) / 2)
    }
    assert(got.nonEmpty)
  }
}
