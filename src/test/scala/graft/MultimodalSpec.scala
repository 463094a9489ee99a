package graft

import graft.ops.llm.{DecodedFrame, DecodedMedia, Multimodal => M}
import org.apache.spark.sql.functions._

/** Golden-byte and round-trip tests for the pure-JVM media decoder:
  * hand-crafted BMP/WAV/PPM fixtures with independently computed expected
  * stats, RIFF chunk-walk and PNM-comment edge cases, corruption handling,
  * and the distributed synth→decode pipeline end to end.
  */
class MultimodalSpec extends SparkSpec {

  // -- golden BMP: 2×2 RGB pixels (1,2,3)(4,5,6) / (7,8,9)(10,11,12),
  //    hand-laid bottom-up BGR with stride padding (row bytes 6 → stride 8).
  private def goldenBmp: Array[Byte] = {
    val b = new Array[Byte](54 + 16)
    def u16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o + 1) = (v >> 8).toByte }
    def u32(o: Int, v: Int): Unit = {
      b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
      b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
    }
    b(0) = 'B'; b(1) = 'M'; u32(2, 70); u32(10, 54)
    u32(14, 40); u32(18, 2); u32(22, 2); u16(26, 1); u16(28, 24); u32(30, 0)
    // bottom row = image row 1: BGR of (7,8,9) then (10,11,12), 2 pad bytes
    val rows = Array[Int](9, 8, 7, 12, 11, 10, 0, 0, /* top row */ 3, 2, 1, 6, 5, 4, 0, 0)
    rows.zipWithIndex.foreach { case (v, i) => b(54 + i) = v.toByte }
    b
  }

  test("golden BMP: dims, padding-excluded sum, order-sensitive wsum") {
    val d = M.parseBmp(7L, goldenBmp)
    assert(d.ok && d.width == 2 && d.height == 2 && d.channels == 3 && d.n_frames == 1)
    assert(d.n_vals == 12L)
    assert(d.val_sum == (1 to 12).sum) // 78; pad bytes excluded
    assert(d.val_wsum == (1 to 12).map(k => k.toLong * k).sum) // Σ k² = 650
  }

  test("golden WAV: chunk walk skips odd-length junk chunk (even padding)") {
    val samples = Array(100, -100, 32767, -32768)
    val data = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { data.write(v & 0xff); data.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    def tag(t: String): Unit = data.write(t.getBytes("US-ASCII"))
    tag("RIFF"); w32(4 + 24 + 12 + 16) ; tag("WAVE")
    tag("fmt "); w32(16); w16(1); w16(1); w32(44100); w32(88200); w16(2); w16(16)
    tag("JUNK"); w32(3); data.write(1); data.write(2); data.write(3); data.write(0) // pad to even
    tag("data"); w32(8); samples.foreach(s => w16(s & 0xffff))
    val d = M.parseWav(5L, data.toByteArray)
    assert(d.ok && d.kind == "audio" && d.sample_rate == 44100 && d.channels == 1)
    assert(d.n_vals == 4L)
    assert(d.val_sum == -1L) // 100 - 100 + 32767 - 32768
    assert(d.val_wsum == 100L - 200L + 3L * 32767 - 4L * 32768) // -32871
  }

  test("golden PPM stream: comment in header, two frames, global wsum") {
    val bytes = ("P6\n# a comment\n2 1\n255\n").getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40, 50, 60) ++
      "P6 2 1 255 ".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4, 5, 6)
    val fs = M.parsePpmFrames(9L, bytes)
    assert(fs.length == 2)
    assert(fs(0) == DecodedFrame(9L, 0L, 2, 1, 210L))
    assert(fs(1) == DecodedFrame(9L, 1L, 2, 1, 21L))
    val d = M.parsePpmStream(9L, bytes)
    assert(d.ok && d.kind == "video" && d.n_frames == 2 && d.n_vals == 12L)
    assert(d.val_sum == 231L)
    assert(d.val_wsum == 910L + 217L) // frame0 Σ(k+1)v + frame1 Σ(k+1)v
  }

  test("corrupt inputs yield ok=false, never throw") {
    assert(!M.parseAny(1L, Array[Byte]()).ok)
    assert(!M.parseAny(1L, "XX".getBytes).ok)
    assert(!M.parseBmp(1L, goldenBmp.take(40)).ok)          // truncated header
    assert(!M.parseBmp(1L, goldenBmp.take(60)).ok)          // truncated pixels
    val wav8 = M.encodeWav(3L, 10, 8000)
    wav8(20) = 2 // audioFormat = ADPCM, not PCM
    assert(!M.parseWav(3L, wav8).ok)
    assert(M.parsePpmFrames(1L, "P6\n2 1\n254\n".getBytes) == null) // maxval != 255
    assert(!M.parsePpmStream(1L, "P6\n9 9\n255\nxy".getBytes).ok)   // short pixels
  }

  test("encode/parse round trip matches arithmetic for all kinds") {
    for (id <- 0L to 29L) {
      val d = (id % 3) match {
        case 0 =>
          val (w, h) = M.imageDims(id); M.parseBmp(id, M.encodeBmp(id, w, h))
        case 1 =>
          val (n, r) = M.audioDims(id); M.parseWav(id, M.encodeWav(id, n, r))
        case _ =>
          val (w, h, f) = M.videoDims(id)
          M.parsePpmStream(id, M.encodePpmStream(id, w, h, f))
      }
      assert(d.ok, s"id=$id")
      // independently re-derive expected stats from the value formulas
      val vals: IndexedSeq[Long] = (id % 3) match {
        case 1 => (0L until d.n_vals).map(k => M.sampleVal(id, k).toLong)
        case _ =>
          val pf = d.width.toLong * d.height * 3
          (0L until d.n_vals).map(k => M.pxVal(id, k / pf, k % pf).toLong)
      }
      assert(d.val_sum == vals.sum, s"id=$id sum")
      assert(d.val_wsum == vals.zipWithIndex.map { case (v, k) => (k + 1) * v }.sum,
        s"id=$id wsum")
    }
  }

  test("audio windows: ragged last window, stats match direct sample walk") {
    val id = 4L // audio kind (4 % 3 == 1); n = 64 + 4 % 193 = 68 samples
    val (n, rate) = M.audioDims(id)
    val ws = M.parseWavWindows(id, M.encodeWav(id, n, rate), 64)
    assert(ws.length == (n + 63) / 64 && ws.length == 2)
    assert(ws(0).n_samples == 64L && ws(1).n_samples == (n - 64).toLong)
    for (w <- ws) {
      val vals = (w.window_idx * 64 until w.window_idx * 64 + w.n_samples)
        .map(k => M.sampleVal(id, k).toLong)
      assert(w.s_sum == vals.sum && w.s_min == vals.min && w.s_max == vals.max)
    }
    assert(M.parseWavWindows(id, Array[Byte](1, 2, 3), 64) == null)
  }

  test("resize: 2x2 floor-average pooling, odd edges dropped, real BMP out") {
    val id = 6L // image kind; w = 4 + 6 % 13 = 10, h = 3 + 6 % 7 = 9 (odd h)
    val (w, h) = M.imageDims(id)
    val rb = M.resizeBmpHalf(id, M.encodeBmp(id, w, h))
    val d = M.parseBmp(id, rb)
    assert(d.ok && d.width == w / 2 && d.height == h / 2)
    // brute-force expected stats straight from pxVal pooling
    val (ow, oh) = (w / 2, h / 2)
    var sum = 0L; var wsum = 0L
    for (or0 <- 0 until oh; oc <- 0 until ow; ch <- 0 until 3) {
      val av = (for (dr <- 0 to 1; dc <- 0 to 1)
        yield M.pxVal(id, 0, ((or0 * 2 + dr).toLong * w + oc * 2 + dc) * 3 + ch)).sum / 4
      val q = (or0.toLong * ow + oc) * 3 + ch
      sum += av; wsum += (q + 1) * av
    }
    assert(d.val_sum == sum && d.val_wsum == wsum)
    // resizing the resized image again also yields a valid BMP
    val rb2 = M.resizeBmpHalf(id, rb)
    assert(rb2 != null && M.parseBmp(id, rb2).ok)
    // corrupt and degenerate inputs return null
    assert(M.resizeBmpHalf(id, Array[Byte](1, 2)) == null)
    assert(M.resizeBmpHalf(0L, M.encodeBmp(0L, 3, 1)) == null) // oh = 0
  }

  test("codec properties: random dims, encode→decode→resize/window invariants") {
    // pure-JVM codec paths — no Spark jobs, so many samples are cheap
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val id = rnd.nextLong(1L << 40)
      val w = 2 + rnd.nextInt(39); val h = 2 + rnd.nextInt(39)
      val bmp = M.encodeBmp(id, w, h)
      val d = M.parseBmp(id, bmp)
      assert(d.ok && d.width == w && d.height == h && d.n_vals == w.toLong * h * 3)
      // resize halves dims and never raises the per-value mean (floor-avg)
      val rd = M.parseBmp(id, M.resizeBmpHalf(id, bmp))
      assert(rd.ok && rd.width == w / 2 && rd.height == h / 2)
      assert(rd.n_vals == (w / 2).toLong * (h / 2) * 3)
      // every pooled value is a floor-average of 4 inputs ≤ 255, ≥ 0
      assert(rd.val_sum >= 0 && rd.val_sum <= rd.n_vals * 255)

      val n = 1 + rnd.nextInt(500); val win = 1 + rnd.nextInt(97)
      val wav = M.encodeWav(id, n, 8000)
      val wd = M.parseWav(id, wav)
      val ws = M.parseWavWindows(id, wav, win)
      // windows exactly partition the stream: counts sum to n, sums to total
      assert(ws.length == (n + win - 1) / win)
      assert(ws.map(_.n_samples).sum == n.toLong)
      assert(ws.map(_.s_sum).sum == wd.val_sum)
      assert(ws.zipWithIndex.forall { case (x, i) => x.window_idx == i.toLong })
      assert(ws.forall(x => x.s_min <= x.s_max &&
        x.s_sum >= x.n_samples * x.s_min && x.s_sum <= x.n_samples * x.s_max))
    }
  }

  test("distributed synth→decode pipeline: parseAny dispatch + frame fan-out") {
    import spark.implicits._
    val docs = (0L until 30L).toDF("doc_id")
    val media = M.synthMedia(docs)
    val decoded = M.decode(media).collect().sortBy(_.doc_id)
    assert(decoded.length == 30 && decoded.forall(_.ok))
    assert(decoded.count(_.kind == "image") == 10)
    assert(decoded.count(_.kind == "audio") == 10)
    assert(decoded.count(_.kind == "video") == 10)
    // spot check one of each against the direct parser
    assert(decoded(0) == M.parseBmp(0L, M.encodeBmp(0L, 4, 3)))
    val (n1, r1) = M.audioDims(1L)
    assert(decoded(1) == M.parseWav(1L, M.encodeWav(1L, n1, r1)))
    val (w2, h2, f2) = M.videoDims(2L)
    assert(decoded(2) == M.parsePpmStream(2L, M.encodePpmStream(2L, w2, h2, f2)))
    // frame fan-out: one row per frame of each video, real per-frame sums
    val frames = M.decodeFrames(media).collect()
    val expFrames = (0L until 30L).filter(_ % 3 == 2)
      .map(id => M.videoDims(id)._3.toLong).sum
    assert(frames.length == expFrames)
    val g = frames.filter(_.doc_id == 2L).sortBy(_.frame_idx)
    assert(g.map(_.frame_idx).toSeq == (0L until M.videoDims(2L)._3.toLong))
    val pf2 = w2 * h2 * 3
    assert(g(1).frame_sum == (0 until pf2).map(j => M.pxVal(2L, 1, j).toLong).sum)
  }
}
