package graft.ops.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by the decoder: parsed header fields plus
  * payload statistics. `n_vals` is the total number of scalar values in the
  * payload (pixel channel bytes, or audio samples); `val_sum` their sum and
  * `val_wsum` the position-weighted sum `Σ (k+1)·v(k)` over the LOGICAL
  * (top-down row-major, frame-major, RGB) order — the weighting makes the
  * stats sensitive to ordering, so a decoder that mishandles BMP's
  * bottom-up rows, BGR channel order, or row padding fails the oracle.
  */
final case class DecodedMedia(
    doc_id: Long, kind: String, width: Int, height: Int, channels: Int,
    n_frames: Int, sample_rate: Int, n_vals: Long, val_sum: Long,
    val_wsum: Long, ok: Boolean)

/** One parsed video frame with its pixel-sum statistic. */
final case class DecodedFrame(
    doc_id: Long, frame_idx: Long, width: Int, height: Int, frame_sum: Long)

/** One fixed-size audio analysis window with its sample statistics. */
final case class AudioWindow(
    doc_id: Long, window_idx: Long, n_samples: Long, s_sum: Long,
    s_min: Long, s_max: Long)

/** One resized image: input/output dims plus the stats of the re-encoded
  * half-scale BMP (all Long — driver-comparator BIGINT discipline).
  */
final case class ResizedImage(
    doc_id: Long, in_w: Long, in_h: Long, out_w: Long, out_h: Long,
    out_bytes: Long, out_n_vals: Long, out_sum: Long, out_wsum: Long)

/** One audio clip's RMS and loudness-normalization gain. */
final case class AudioGain(
    doc_id: Long, n_samples: Long, sum_sq: Long, rms6: Double, gain6: Double)

/** One image channel's pixel statistics (channel = logical RGB index). */
final case class ChannelStats(
    doc_id: Long, channel: Int, n_px: Long, ch_sum: Long, ch_min: Long,
    ch_max: Long)

/** One audio clip's silence-run profile (runs of |sample| < threshold). */
final case class AudioSilence(
    doc_id: Long, n_samples: Long, n_quiet: Long, n_runs: Long,
    longest_run: Long)

/** One image perceptual hash (difference hash over the decoded pixels):
  * 63 brightness-comparison bits packed into a BIGINT.
  */
final case class ImagePHash(
    doc_id: Long, width: Int, height: Int, phash: Long, ok: Boolean)

/** Multimodal columns: image/audio/video payloads travel as opaque `binary`
  * columns with typed metadata beside them (north-star mandate).
  *
  * The decoder here is REAL: a pure-JVM parser for three uncompressed
  * container formats — BMP (24-bit BITMAPINFOHEADER, bottom-up BGR rows
  * padded to 4 bytes), WAV (RIFF chunk walk, 16-bit PCM mono) and a P6
  * PPM frame stream (ffmpeg image2pipe-style concatenated frames) for
  * video. No media libraries exist in this container, so the PAYLOADS are
  * synthesized (deterministic arithmetic over doc_id, see [[synthMedia]]),
  * but every byte the decoder consumes is a well-formed instance of the
  * real format: magic numbers, little-endian header fields, chunk sizes,
  * row strides. Compressed codecs (JPEG/FLAC/H.264) would slot in behind
  * the same `mapPartitions` batch shape.
  */
object Multimodal {

  // ---------------------------------------------------------------------
  // Deterministic payload synthesis (the test-fixture side; in production
  // payloads arrive from object storage). All arithmetic is replayed by
  // the DuckDB oracle, so the encode→parse round trip is value-checked
  // end to end.
  // ---------------------------------------------------------------------

  /** Pixel channel value at frame `f`, logical index `j` (top-down
    * row-major RGB) for document `id`. Range 0..255.
    */
  def pxVal(id: Long, f: Long, j: Long): Int =
    ((31L * id + 13L * f + 7L * j) % 256L).toInt

  /** Signed 16-bit audio sample `k` for document `id`. Range −2048..2047. */
  def sampleVal(id: Long, k: Long): Int =
    ((131L * id + 17L * k) % 4096L - 2048L).toInt

  /** Per-kind dimensions, pure arithmetic over doc_id (small payloads:
    * ≤ ~2.7 KiB/doc, so even sf1's 50k docs stay trivially distributed).
    */
  def imageDims(id: Long): (Int, Int) = ((4 + id % 13).toInt, (3 + id % 7).toInt)
  def videoDims(id: Long): (Int, Int, Int) =
    ((4 + id % 9).toInt, (3 + id % 5).toInt, (2 + id % 9).toInt) // (w, h, frames)
  def audioDims(id: Long): (Int, Int) =
    ((64 + id % 193).toInt, (8000 + 4000 * (id % 3)).toInt) // (samples, rate)

  private def u16le(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def u32le(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  /** 24-bit uncompressed BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER, rows bottom-up, pixels BGR, stride padded to 4.
    */
  def encodeBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val size = 54 + stride * h
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    u32le(b, 2, size); u32le(b, 10, 54)
    u32le(b, 14, 40); u32le(b, 18, w); u32le(b, 22, h)
    u16le(b, 26, 1); u16le(b, 28, 24); u32le(b, 30, 0)
    u32le(b, 34, stride * h)
    var r = 0
    while (r < h) {
      val rowOff = 54 + (h - 1 - r) * stride // bottom-up
      var c = 0
      while (c < w) {
        val j = (r.toLong * w + c) * 3 // logical RGB base index
        b(rowOff + c * 3) = pxVal(id, 0, j + 2).toByte     // B
        b(rowOff + c * 3 + 1) = pxVal(id, 0, j + 1).toByte // G
        b(rowOff + c * 3 + 2) = pxVal(id, 0, j).toByte     // R
        c += 1
      }
      r += 1
    }
    b
  }

  /** PCM 16-bit mono WAV: RIFF header, `fmt ` chunk, `data` chunk. */
  def encodeWav(id: Long, n: Int, rate: Int): Array[Byte] = {
    val dataBytes = n * 2
    val b = new Array[Byte](44 + dataBytes)
    b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
    u32le(b, 4, 36 + dataBytes)
    b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
    b(12) = 'f'; b(13) = 'm'; b(14) = 't'; b(15) = ' '
    u32le(b, 16, 16)
    u16le(b, 20, 1); u16le(b, 22, 1) // PCM, mono
    u32le(b, 24, rate); u32le(b, 28, rate * 2)
    u16le(b, 32, 2); u16le(b, 34, 16)
    b(36) = 'd'; b(37) = 'a'; b(38) = 't'; b(39) = 'a'
    u32le(b, 40, dataBytes)
    var k = 0
    while (k < n) {
      u16le(b, 44 + k * 2, sampleVal(id, k) & 0xffff)
      k += 1
    }
    b
  }

  /** Video as a concatenated stream of binary P6 PPM frames (the
    * image2pipe shape): each frame `P6\n<w> <h>\n255\n` + w·h·3 RGB bytes.
    */
  def encodePpmStream(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val pf = w * h * 3
    var f = 0
    while (f < frames) {
      out.write(s"P6\n$w $h\n255\n".getBytes("US-ASCII"))
      var j = 0
      while (j < pf) { out.write(pxVal(id, f, j)); j += 1 }
      f += 1
    }
    out.toByteArray
  }

  /** Attach a synthesized real-format binary payload + typed metadata to
    * each document. `kind` cycles deterministically (doc_id % 3) so every
    * decoder branch is exercised. Narrow scan: only doc_id is read.
    */
  def synthMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        (id % 3) match {
          case 0 =>
            val (w, h) = imageDims(id)
            (id, "image", encodeBmp(id, w, h))
          case 1 =>
            val (n, rate) = audioDims(id)
            (id, "audio", encodeWav(id, n, rate))
          case _ =>
            val (w, h, f) = videoDims(id)
            (id, "video", encodePpmStream(id, w, h, f))
        }
      }
    }.toDF("doc_id", "kind", "payload")
      .withColumn("byte_len", octet_length(col("payload")).cast("long"))
  }

  // ---------------------------------------------------------------------
  // Parsers. Defensive: any malformed header/short payload yields ok=false
  // with zeroed stats instead of throwing (a 100 TB scan must not die on
  // one corrupt object).
  // ---------------------------------------------------------------------

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) |
      ((b(o + 3) & 0xff) << 24)
  private def s16(b: Array[Byte], o: Int): Int = u16(b, o).toShort.toInt

  private def bad(id: Long, kind: String): DecodedMedia =
    DecodedMedia(id, kind, 0, 0, 0, 0, 0, 0L, 0L, 0L, ok = false)

  /** Parse a 24-bit uncompressed BMP; stats over logical top-down RGB
    * order (undoing bottom-up rows, BGR order and stride padding).
    */
  def parseBmp(id: Long, b: Array[Byte]): DecodedMedia = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return bad(id, "image")
    val dataOff = u32(b, 10)
    val w = u32(b, 18); val h = u32(b, 22)
    val bpp = u16(b, 28); val compression = u32(b, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return bad(id, "image")
    val stride = (w * 3 + 3) / 4 * 4
    if (dataOff.toLong + stride.toLong * h > b.length) return bad(id, "image")
    var sum = 0L; var wsum = 0L
    var r = 0
    while (r < h) {
      val rowOff = dataOff + (h - 1 - r) * stride
      var c = 0
      while (c < w) {
        val jBase = (r.toLong * w + c) * 3
        val red = b(rowOff + c * 3 + 2) & 0xff
        val green = b(rowOff + c * 3 + 1) & 0xff
        val blue = b(rowOff + c * 3) & 0xff
        sum += red + green + blue
        wsum += (jBase + 1) * red + (jBase + 2) * green + (jBase + 3) * blue
        c += 1
      }
      r += 1
    }
    DecodedMedia(id, "image", w, h, 3, 1, 0, w.toLong * h * 3, sum, wsum, ok = true)
  }

  /** Parse a RIFF/WAVE file by walking chunks (even-padded per the RIFF
    * rule) until `fmt ` and `data` are found; 16-bit PCM mono only.
    */
  def parseWav(id: Long, b: Array[Byte]): DecodedMedia = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return bad(id, "audio")
    var off = 12
    var rate = -1; var bits = -1; var nch = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val cid = new String(b, off, 4, "US-ASCII")
      val clen = u32(b, off + 4)
      if (clen < 0 || off + 8 + clen > b.length) return bad(id, "audio")
      if (cid == "fmt " && clen >= 16) {
        if (u16(b, off + 8) != 1) return bad(id, "audio") // PCM only
        nch = u16(b, off + 10); rate = u32(b, off + 12); bits = u16(b, off + 22)
      } else if (cid == "data") { dataOff = off + 8; dataLen = clen }
      off += 8 + clen + (clen & 1) // RIFF chunks pad to even
    }
    if (rate < 0 || dataOff < 0 || bits != 16 || nch != 1) return bad(id, "audio")
    val n = dataLen / 2
    var sum = 0L; var wsum = 0L
    var k = 0
    while (k < n) {
      val s = s16(b, dataOff + k * 2)
      sum += s; wsum += (k + 1L) * s
      k += 1
    }
    DecodedMedia(id, "audio", 0, 0, 1, 1, rate, n.toLong, sum, wsum, ok = true)
  }

  /** Locate the `data` chunk of a RIFF/WAVE buffer that [[parseWav]] has
    * ALREADY validated (ok = true): returns (dataOff, dataLen). The
    * walk's termination and bounds were proven by parseWav — this helper
    * is the one place that post-validation assumption lives, shared by
    * [[parseWavWindows]], [[wavGain]] and [[wavSilence]].
    */
  private def dataChunk(b: Array[Byte]): (Int, Int) = {
    var off = 12
    while (true) {
      val cid = new String(b, off, 4, "US-ASCII")
      val clen = u32(b, off + 4)
      if (cid == "data") return (off + 8, clen)
      off += 8 + clen + (clen & 1)
    }
    throw new IllegalStateException("unreachable: parseWav validated a data chunk")
  }

  /** Parse one PNM ASCII integer starting at `off`, skipping whitespace
    * and `#` comments (legal in PNM headers). Returns (value, nextOffset)
    * or null on malformed input.
    */
  private def ppmInt(b: Array[Byte], off0: Int): (Int, Int) = {
    var off = off0
    while (off < b.length) {
      val ch = b(off) & 0xff
      if (ch == '#') { while (off < b.length && b(off) != '\n') off += 1 }
      else if (Character.isWhitespace(ch)) off += 1
      else {
        var v = 0; var any = false
        while (off < b.length && (b(off) & 0xff) >= '0' && (b(off) & 0xff) <= '9') {
          v = v * 10 + (b(off) - '0'); any = true; off += 1
        }
        return if (any) (v, off) else null
      }
    }
    null
  }

  /** Parse every P6 frame of a concatenated PPM stream; per-frame pixel
    * sums plus whole-stream stats in logical frame-major order.
    */
  def parsePpmFrames(id: Long, b: Array[Byte]): Array[DecodedFrame] = {
    val frames = Array.newBuilder[DecodedFrame]
    var off = 0
    var fi = 0L
    while (off < b.length) {
      if (off + 2 > b.length || b(off) != 'P' || b(off + 1) != '6') return null
      var cur = off + 2
      val pw = ppmInt(b, cur); if (pw == null) return null
      val ph = ppmInt(b, pw._2); if (ph == null) return null
      val pm = ppmInt(b, ph._2); if (pm == null || pm._1 != 255) return null
      val (w, h) = (pw._1, ph._1)
      val pixOff = pm._2 + 1 // exactly one whitespace byte after maxval
      val pf = w * h * 3
      if (w <= 0 || h <= 0 || pixOff + pf > b.length) return null
      var sum = 0L
      var j = 0
      while (j < pf) { sum += b(pixOff + j) & 0xff; j += 1 }
      frames += DecodedFrame(id, fi, w, h, sum)
      fi += 1
      off = pixOff + pf
    }
    frames.result()
  }

  /** Windowed audio analysis over a parsed WAV: fixed `win`-sample
    * windows (last one ragged), per-window count/sum/min/max — the
    * feature-extraction shape of an audio pipeline (VAD, loudness,
    * silence trimming all reduce windows like this). Returns null on a
    * malformed container, mirroring [[parseWav]]'s ok=false.
    */
  def parseWavWindows(id: Long, b: Array[Byte], win: Int): Array[AudioWindow] = {
    val d = parseWav(id, b)
    if (!d.ok) return null
    val (dataOff, dataLen) = dataChunk(b)
    val n = dataLen / 2
    val out = Array.newBuilder[AudioWindow]
    var w = 0
    while (w * win < n) {
      val lo = w * win
      val hi = math.min(n, lo + win)
      var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      var k = lo
      while (k < hi) {
        val s = s16(b, dataOff + k * 2).toLong
        sum += s; if (s < mn) mn = s; if (s > mx) mx = s
        k += 1
      }
      out += AudioWindow(id, w.toLong, (hi - lo).toLong, sum, mn, mx)
      w += 1
    }
    out.result()
  }

  /** Half-scale 2×2 box-filter resize of a 24-bit BMP, producing a REAL
    * re-encoded BMP (header + bottom-up BGR rows + stride padding). Each
    * output channel is the floor-average of its 2×2 input block; odd
    * trailing rows/columns are dropped (pooling without padding). Returns
    * null on a malformed container or a degenerate (<2×2) image.
    */
  def resizeBmpHalf(id: Long, b: Array[Byte]): Array[Byte] = {
    val d = parseBmp(id, b)
    if (!d.ok) return null
    val w = d.width; val h = d.height
    val ow = w / 2; val oh = h / 2
    if (ow == 0 || oh == 0) return null
    val dataOff = u32(b, 10)
    val stride = (w * 3 + 3) / 4 * 4
    val outStride = (ow * 3 + 3) / 4 * 4
    val out = new Array[Byte](54 + outStride * oh)
    out(0) = 'B'; out(1) = 'M'
    u32le(out, 2, out.length); u32le(out, 10, 54)
    u32le(out, 14, 40); u32le(out, 18, ow); u32le(out, 22, oh)
    u16le(out, 26, 1); u16le(out, 28, 24); u32le(out, 30, 0)
    u32le(out, 34, outStride * oh)
    var orow = 0
    while (orow < oh) {
      val outRowOff = 54 + (oh - 1 - orow) * outStride // bottom-up, like input
      var oc = 0
      while (oc < ow) {
        var bgr = 0
        while (bgr < 3) {
          var acc = 0
          var dr = 0
          while (dr < 2) {
            val rowOff = dataOff + (h - 1 - (orow * 2 + dr)) * stride
            acc += (b(rowOff + (oc * 2) * 3 + bgr) & 0xff) +
              (b(rowOff + (oc * 2 + 1) * 3 + bgr) & 0xff)
            dr += 1
          }
          out(outRowOff + oc * 3 + bgr) = (acc / 4).toByte
          bgr += 1
        }
        oc += 1
      }
      orow += 1
    }
    out
  }

  /** Whole-stream video stats from the parsed frames. */
  def parsePpmStream(id: Long, b: Array[Byte]): DecodedMedia = {
    val frames = parsePpmFrames(id, b)
    if (frames == null || frames.isEmpty) return bad(id, "video")
    val (w, h) = (frames(0).width, frames(0).height)
    if (frames.exists(f => f.width != w || f.height != h)) return bad(id, "video")
    val pf = w.toLong * h * 3
    var sum = 0L; var wsum = 0L
    // wsum needs per-value positions: re-walk bytes with the global index.
    var off = 0; var k = 0L
    var fOk = true
    while (off < b.length && fOk) {
      val pw = ppmInt(b, off + 2); val ph = ppmInt(b, pw._2)
      val pm = ppmInt(b, ph._2)
      val pixOff = pm._2 + 1
      var j = 0
      while (j < pf) {
        val v = b(pixOff + j.toInt) & 0xff
        sum += v; wsum += (k + 1) * v
        j += 1; k += 1
      }
      off = pixOff + pf.toInt
      if (off < b.length && (off + 2 > b.length)) fOk = false
    }
    DecodedMedia(id, "video", w, h, 3, frames.length, 0,
      pf * frames.length, sum, wsum, ok = true)
  }

  /** Sniff the container by magic bytes and dispatch. */
  def parseAny(id: Long, b: Array[Byte]): DecodedMedia =
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') parseBmp(id, b)
    else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      parseWav(id, b)
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') parsePpmStream(id, b)
    else bad(id, if (b.length >= 2) "unknown" else "empty")

  // ---------------------------------------------------------------------
  // Spark operators.
  // ---------------------------------------------------------------------

  /** Partition-wise decode of binary payloads: each partition's payloads
    * are parsed in a tight loop (per-partition decoder setup would happen
    * once, here at the head of the iterator), memory bounded to one
    * payload at a time. Fully distributed — no collect, no shuffle.
    */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) => parseAny(id, bytes) }
      }
  }

  /** Difference hash (dHash — the classic perceptual near-dup signature,
    * cf. pHash/blockhash literature) of a BMP payload, computed from the
    * DECODED bytes: brightness `gray(p) = r+g+b` at 64 positions sampled
    * evenly along the row-major pixel sequence, each bit = "brighter than
    * the next sample". Integer-only (no resize interpolation, no divide),
    * so the DuckDB oracle replays it from the pixel formula while this
    * side walks the real BGR/bottom-up/padded byte layout. 63 bits keep
    * the pack inside a signed BIGINT.
    */
  def bmpPHash(id: Long, b: Array[Byte]): ImagePHash = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M')
      return ImagePHash(id, 0, 0, 0L, ok = false)
    val dataOff = u32(b, 10)
    val w = u32(b, 18); val h = u32(b, 22)
    val bpp = u16(b, 28); val compression = u32(b, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0)
      return ImagePHash(id, 0, 0, 0L, ok = false)
    val stride = (w * 3 + 3) / 4 * 4
    if (dataOff.toLong + stride.toLong * h > b.length)
      return ImagePHash(id, 0, 0, 0L, ok = false)
    def gray(p: Int): Int = {
      val r = p / w; val c = p % w
      val off = dataOff + (h - 1 - r) * stride + c * 3
      (b(off) & 0xff) + (b(off + 1) & 0xff) + (b(off + 2) & 0xff)
    }
    val npx = w * h
    var hash = 0L
    var t = 0
    while (t < 63) {
      val p = t * (npx - 1) / 64
      val q = (t + 1) * (npx - 1) / 64
      if (gray(p) > gray(q)) hash |= 1L << t
      t += 1
    }
    ImagePHash(id, w, h, hash, ok = true)
  }

  /** Per-channel statistics of a BMP payload from the DECODED bytes —
    * the exposure/color screen an image-curation pipeline gates on (a
    * channel stuck at 0/255 or a crushed range flags synthetic or
    * corrupted captures). Channel index is the LOGICAL RGB position
    * (0=R, 1=G, 2=B); the walk undoes bottom-up rows, BGR byte order and
    * stride padding, so a swapped-channel or padding mistake shifts the
    * per-channel sums and fails the oracle.
    */
  def bmpChannelStats(id: Long, b: Array[Byte]): Array[ChannelStats] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return null
    val dataOff = u32(b, 10)
    val w = u32(b, 18); val h = u32(b, 22)
    val bpp = u16(b, 28); val compression = u32(b, 30)
    if (bpp != 24 || compression != 0 || w <= 0 || h <= 0) return null
    val stride = (w * 3 + 3) / 4 * 4
    if (dataOff.toLong + stride.toLong * h > b.length) return null
    val sum = new Array[Long](3)
    val mn = Array.fill(3)(255L); val mx = new Array[Long](3)
    var r = 0
    while (r < h) {
      val rowOff = dataOff + (h - 1 - r) * stride
      var c = 0
      while (c < w) {
        var ch = 0
        while (ch < 3) {
          // logical channel ch lives at BGR byte offset 2-ch
          val v = (b(rowOff + c * 3 + (2 - ch)) & 0xff).toLong
          sum(ch) += v
          if (v < mn(ch)) mn(ch) = v
          if (v > mx(ch)) mx(ch) = v
          ch += 1
        }
        c += 1
      }
      r += 1
    }
    Array.tabulate(3)(ch =>
      ChannelStats(id, ch, w.toLong * h, sum(ch), mn(ch), mx(ch)))
  }

  /** RMS + normalization gain of a parsed WAV — the loudness-
    * normalization pass an audio pipeline runs before feature extraction
    * (EBU R128-style target, simplified to a fixed RMS target of 1000
    * 16-bit units): gain = √(target²·n / Σs²), the factor that scales
    * the clip to target RMS. Sum of squares is exact integer arithmetic
    * from the real PCM bytes; the two display roots are identical IEEE
    * sequences on both engines. Returns null on a malformed container.
    */
  def wavGain(id: Long, b: Array[Byte]): AudioGain = {
    val d = parseWav(id, b)
    if (!d.ok) return null
    val (dataOff, dataLen) = dataChunk(b)
    val n = dataLen / 2
    var sumsq = 0L
    var k = 0
    while (k < n) {
      val s = s16(b, dataOff + k * 2).toLong
      sumsq += s * s
      k += 1
    }
    val rms6 =
      if (n == 0) 0.0
      else BigDecimal(math.sqrt(sumsq.toDouble / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gain6 =
      if (sumsq == 0L) 0.0
      else BigDecimal(math.sqrt(1000000.0 * n / sumsq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    AudioGain(id, n.toLong, sumsq, rms6, gain6)
  }

  /** Silence-run profile of one clip: runs of consecutive samples with
    * |s| < threshold — the voice-activity-detection / dead-air screen an
    * audio pipeline gates on before feature extraction. Computed in ONE
    * pass inside the decoder (counters only, no per-sample rows ever
    * materialize — at 100 TB the per-sample explode+window alternative
    * would shuffle 10⁴× the payload bytes).
    */
  def wavSilence(id: Long, b: Array[Byte], threshold: Int): AudioSilence = {
    val d = parseWav(id, b)
    if (!d.ok) return null
    val (dataOff, dataLen) = dataChunk(b)
    val n = dataLen / 2
    var quiet = 0L; var runs = 0L; var longest = 0L; var cur = 0L
    var k = 0
    while (k < n) {
      val s = s16(b, dataOff + k * 2)
      if (math.abs(s) < threshold) {
        if (cur == 0L) runs += 1
        cur += 1; quiet += 1
        if (cur > longest) longest = cur
      } else cur = 0L
      k += 1
    }
    AudioSilence(id, n.toLong, quiet, runs, longest)
  }

  /** Per-clip silence-run profiles (map-only; corrupt containers
    * contribute zero rows).
    */
  def silences(media: DataFrame, threshold: Int = 256): Dataset[AudioSilence] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) => Option(wavSilence(id, bytes, threshold)) }
      }
  }

  /** Per-clip RMS/gain of the audio payloads (map-only; corrupt
    * containers contribute zero rows).
    */
  def audioGains(media: DataFrame): Dataset[AudioGain] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) => Option(wavGain(id, bytes)) }
      }
  }

  /** Per-image per-channel stats of the image payloads (map-only fan-out
    * of exactly 3 rows per image; corrupt payloads contribute zero rows).
    */
  def channelStats(media: DataFrame): Dataset[ChannelStats] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          Option(bmpChannelStats(id, bytes)).getOrElse(Array.empty[ChannelStats]).toSeq
        }
      }
  }

  /** Per-image perceptual hashes of the image payloads (map-only). */
  def phashes(media: DataFrame): Dataset[ImagePHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) => bmpPHash(id, bytes) }
      }
  }

  /** Per-frame decode of the video payloads: one output row per parsed
    * frame with its pixel sum. Fan-out bounded by n_frames; corrupt
    * streams contribute zero rows (mirrors `ok=false`).
    */
  def decodeFrames(media: DataFrame): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          Option(parsePpmFrames(id, bytes)).getOrElse(Array.empty[DecodedFrame]).toSeq
        }
      }
  }

  /** Per-window decode of the audio payloads: one output row per
    * `win`-sample analysis window with count/sum/min/max. Distributed
    * flatMap fan-out bounded by n_samples/win; corrupt containers
    * contribute zero rows.
    */
  def decodeAudioWindows(media: DataFrame, win: Int = 64): Dataset[AudioWindow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          Option(parseWavWindows(id, bytes, win)).getOrElse(Array.empty[AudioWindow]).toSeq
        }
      }
  }

  /** Distributed half-scale resize of the image payloads: each BMP is
    * decoded, 2×2 box-filtered, re-encoded as a real BMP, and the output
    * row carries the re-parsed stats of the RESIZED payload (so the whole
    * decode→resize→encode→decode loop is exercised per row). Map-only —
    * no shuffle; corrupt containers contribute zero rows.
    */
  def decodeResized(media: DataFrame): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image")
      .select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          val rb = resizeBmpHalf(id, bytes)
          if (rb == null) None
          else {
            val in = parseBmp(id, bytes)
            val out = parseBmp(id, rb)
            Some(ResizedImage(id, in.width.toLong, in.height.toLong,
              out.width.toLong, out.height.toLong, rb.length.toLong,
              out.n_vals, out.val_sum, out.val_wsum))
          }
        }
      }
  }

  /** Documents and embedding vectors joined into one multimodal frame:
    * text + vector columns side by side, per-(lang,label) stats.
    */
  def joinedStats(docs: DataFrame, emb: DataFrame): DataFrame =
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .groupBy("lang", "label")
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        sum(octet_length(col("text"))).cast("long").as("sum_bytes"),
        min(col("doc_id")).as("min_doc"))
}
