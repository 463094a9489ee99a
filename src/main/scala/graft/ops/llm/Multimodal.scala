package graft.ops.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Decoded-media record produced by the (stubbed) decoder. */
final case class DecodedMedia(
    doc_id: Long, kind: String, width: Int, height: Int, n_frames: Int, ok: Boolean)

/** Multimodal columns: image/audio/video payloads travel as opaque `binary`
  * columns with typed metadata beside them (north-star mandate). The
  * Spark-side plumbing — schema, encoders, partition-wise batch decode — is
  * real and tested; only the innermost byte→pixels step is stubbed because
  * no media libraries exist in this container.
  */
object Multimodal {

  /** Attach a binary payload + typed metadata to each document. The
    * payload here is the UTF-8 text bytes standing in for real media; the
    * `kind` column cycles deterministically so every branch of the decoder
    * is exercised.
    */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      // octet_length = UTF-8 byte count — must agree with the decoder's
      // bytes.length (length() would count characters and diverge on
      // non-ASCII text).
      octet_length(col("text")).cast("long").as("byte_len"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"))

  /** Partition-wise decode of binary payloads.
    *
    * STUB: the real implementation would hand each partition's payloads to
    * a native decoder (libjpeg/ffmpeg/...) in batches — exactly this
    * `mapPartitions` shape, which amortizes per-batch library setup and
    * keeps memory bounded to a partition. Since those libraries are absent
    * here, the byte→dimensions step below fabricates deterministic values
    * from the payload bytes; swap `fakeDecode` for the real call.
    */
  def decodeStub(media: DataFrame): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "payload", "kind").as[(Long, Array[Byte], String)]
      .mapPartitions { batch =>
        // real decoder init would happen once per partition, here:
        batch.map { case (id, bytes, kind) => fakeDecode(id, bytes, kind) }
      }
  }

  /** Deterministic stand-in for the native decode call (`???` in spirit).
    * Fabricated dimensions are pure arithmetic over the payload length so
    * the whole mapPartitions pipeline is oracle-checkable end-to-end.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte], kind: String): DecodedMedia = {
    val len = bytes.length
    DecodedMedia(
      doc_id = id,
      kind = kind,
      width = 16 + len % 1024,
      height = 16 + (len * 7) % 1024,
      n_frames = if (kind == "video") 1 + len % 120 else 1,
      ok = len > 0)
  }

  /** Deterministic frame sampling over decoded video media: every
    * `every`-th frame index of each video, exploded to one row per sampled
    * frame — the Spark-side plumbing of a frame-extraction stage (the real
    * decoder would seek to `frame_idx`; offsets here are the stub's
    * arithmetic). Explode keeps it fully distributed: no per-video
    * collect, fan-out bounded by n_frames/every.
    */
  def frameSample(decoded: Dataset[DecodedMedia], every: Int = 10): DataFrame =
    decoded.toDF().filter(col("kind") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(every))).as("__f"))
      .select(col("doc_id"), col("n_frames"), col("__f").cast("long").as("frame_idx"))

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
