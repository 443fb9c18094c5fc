package graft.ops

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded per-partition in batches.
  *
  * The decode step is a clearly-marked STUB (no image/audio libs in this
  * container): it derives deterministic fake dimensions from the md5 of
  * the bytes. Everything AROUND the stub is the real production shape:
  *  - media travels as a binary column next to its id (columnar parquet
  *    stores it as a byte-array chunk; column pruning still works for
  *    metadata-only queries);
  *  - decoding runs in `mapPartitions`, one decoder instance per
  *    partition (the batch shape you'd use for a JNI/FFI decoder), never
  *    per-row construction, never driver-side;
  *  - output is a typed Dataset[MediaMeta] with a stable schema.
  *
  * Swapping in a real decoder = replacing `decodeOne`'s body.
  */
object Multimodal {

  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                             height: Long, n_frames: Long, fmt: String)

  private val formats = Array("image", "audio", "video")

  /** STUB decode: md5-derived fake dimensions (deterministic; mirrored by
    * the DuckDB oracle's hex arithmetic). A real implementation would
    * parse the container header / run the codec here.
    */
  private[graft] def decodeOne(docId: Long, bytes: Array[Byte], md: MessageDigest): MediaMeta = {
    md.reset()
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    def hx(from: Int, len: Int): Long = java.lang.Long.parseLong(hex.substring(from, from + len), 16)
    MediaMeta(
      doc_id = docId,
      n_bytes = bytes.length.toLong,
      width = 1L + hx(0, 4) % 1024,
      height = 1L + hx(4, 4) % 1024,
      n_frames = 1L + hx(8, 4) % 64,
      fmt = formats((hx(12, 4) % 3).toInt))
  }

  /** documents.text treated as the opaque media payload (utf-8 bytes). */
  def mediaTable(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))

  /** Batch decode: one MessageDigest (decoder handle) per partition. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) => decodeOne(id, bytes, md) }
      }
  }

  final case class Resized(doc_id: Long, out_w: Long, out_h: Long, out_bytes: Long,
                           out_media: Array[Byte])

  private def resizedDims(m: MediaMeta, maxW: Long): (Long, Long) = {
    val w = math.min(m.width, maxW)
    (w, math.max(1L, m.height * w / m.width))
  }

  /** Resize-to-max-width: clamps width to `maxW`, scales height
    * proportionally (integer math), and emits the re-encoded payload as a
    * new binary column — the production shape: a resized image IS a new
    * byte buffer riding next to its id into the next parquet stage. The
    * stub "re-encode" fills exactly w·h·3 bytes (RGB) with a
    * deterministic per-doc pattern; a real codec replaces the fill with
    * the encoder call, same shape and schema. Runs in the same
    * per-partition decoder batch as [[decode]].
    */
  def resize(spark: SparkSession, media: DataFrame, maxW: Long = 256L): Dataset[Resized] = {
    import spark.implicits._
    decode(spark, media).map { m =>
      val (w, h) = resizedDims(m, maxW)
      // (w*h*3L).toInt silently overflows negative on a pathological
      // aspect ratio (huge height, width clamped) — fail loudly instead.
      require(w * h * 3L <= Int.MaxValue,
        s"resize payload ${w}x$h exceeds max byte-array size (doc_id=${m.doc_id})")
      val n = (w * h * 3L).toInt
      // STUB re-encode: deterministic byte pattern (real codec goes here)
      val payload = new Array[Byte](n)
      var i = 0
      while (i < n) { payload(i) = ((m.doc_id * 31 + i * 7) & 0xFF).toByte; i += 1 }
      Resized(m.doc_id, w, h, n.toLong, payload)
    }
  }

  /** Metadata-only projection of [[resize]] for the oracle/bench tier —
    * dimension arithmetic without materializing payload bytes (the typed
    * map in resize() computes its payload even under a downstream
    * .select, so metadata consumers get their own path).
    */
  def resizeMeta(spark: SparkSession, media: DataFrame, maxW: Long = 256L): DataFrame = {
    import spark.implicits._
    decode(spark, media).map { m =>
      val (w, h) = resizedDims(m, maxW)
      (m.doc_id, w, h, w * h * 3L)
    }.toDF("doc_id", "out_w", "out_h", "out_bytes")
  }

  final case class FrameRef(doc_id: Long, frame_idx: Long, fp: Long)

  /** Frame sampling: decode → emit ~`every` evenly-strided frame
    * references per media item (stride = max(n_frames / every, 1)). The
    * variable-fanout flatMap is the real extraction shape (one input row
    * → n output frames, executor-side, no driver involvement); the
    * per-frame fingerprint is the stub codec's stand-in for a real
    * perceptual hash, deterministic so the oracle mirrors it in integer
    * arithmetic.
    */
  def frameSample(spark: SparkSession, media: DataFrame, every: Int = 4): Dataset[FrameRef] = {
    import spark.implicits._
    decode(spark, media).flatMap { m =>
      val stride = math.max(m.n_frames / every, 1L)
      (0L until m.n_frames by stride).map(i =>
        FrameRef(m.doc_id, i, (m.doc_id * 1000003L + i * 7919L) % 2147483647L))
    }
  }

  final case class AudioWindow(doc_id: Long, seg_idx: Long, start_ms: Long,
                               end_ms: Long, dur_ms: Long)

  /** Sliding audio segmentation (win/hop in ms) over the STUB duration
    * (md5 hex chars 17–20 → 500 + h % 20000 ms; a real decoder reads
    * the container header exactly here): one window per hop position,
    * the last clipped at the clip end, short clips yielding a single
    * clipped window — the segmentation an ASR/feature pipeline runs
    * before spectrogram extraction. Expansion happens inside the same
    * per-partition decoder batch as [[decode]]; each segment leaves the
    * executor as ids + three BIGINTs, never payload copies.
    */
  def audioWindows(spark: SparkSession, media: DataFrame,
                   winMs: Long = 4000L, hopMs: Long = 2000L): Dataset[AudioWindow] = {
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          md.reset()
          val hex = md.digest(bytes).map(b => f"$b%02x").mkString
          val dur = 500L + java.lang.Long.parseLong(hex.substring(16, 20), 16) % 20000L
          val n = 1L + math.max(0L, (dur - winMs) / hopMs)
          (0L until n).map(i => AudioWindow(id, i, i * hopMs,
            math.min(i * hopMs + winMs, dur), dur))
        }
      }
  }

  final case class MediaPhash(doc_id: Long, ph: Long)

  /** Perceptual hash over the decoded descriptor: bit i set iff the
    * i-th descriptor bin clears its midpoint (>= 128) — the stub
    * stand-in for DCT-sign pHash (real codec: decode, downsample to
    * `bits` pixels, DCT, sign of the AC coefficients — exactly where
    * the bin comparison sits). Computed inside the same per-partition
    * decoder batch as [[featureExtract]]; the hash leaves the executor
    * as one BIGINT per media item, so downstream dedup shuffles 8
    * bytes per image no matter the payload size.
    */
  def phash(spark: SparkSession, media: DataFrame, bits: Int = 16): Dataset[MediaPhash] = {
    import spark.implicits._
    featureExtract(spark, media, bits).map { f =>
      var ph = 0L
      var i = 0
      while (i < f.feat.length) {
        if (f.feat(i) >= 128L) ph |= (1L << i)
        i += 1
      }
      MediaPhash(f.doc_id, ph)
    }
  }

  final case class MediaFeat(doc_id: Long, feat: Array[Long])

  /** Feature extraction: media payload → fixed-dim feature vector (the
    * embedding-model / perceptual-descriptor step). STUB features: the
    * 16 md5 bytes of the payload read as 8 two-hex-char bins in 0..255
    * (a real implementation runs the vision/audio model here — one
    * model handle per PARTITION, exactly where the MessageDigest sits).
    * Integer bins keep the oracle compare exact; normalizing to
    * Array[Float] for an ANN index is a one-line map downstream.
    */
  def featureExtract(spark: SparkSession, media: DataFrame, dims: Int = 8): Dataset[MediaFeat] = {
    // md5 yields 32 hex chars = 16 two-char bins; fail fast at the API
    // boundary, not per-row in an executor stack trace
    require(dims >= 1 && dims <= 16, s"dims must be in [1, 16], got $dims")
    import spark.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5") // the "model handle"
        it.map { case (id, bytes) =>
          md.reset()
          val hex = md.digest(bytes).map(b => f"$b%02x").mkString
          MediaFeat(id, Array.tabulate(dims)(i =>
            java.lang.Long.parseLong(hex.substring(2 * i, 2 * i + 2), 16)))
        }
      }
  }
}
