package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Hashing

/**
 * Multimodal column plumbing: opaque binary payloads + typed metadata, with
 * decode/feature-extraction as a batched per-partition stage.
 *
 * The DECODE step is a clearly-marked deterministic FAKE (no image/audio
 * codecs in this environment); everything around it — the binary schema,
 * the partition-batched UDF shape, fixed-dim feature output, metadata
 * struct — is the real Spark plumbing a production decode would slot into
 * (swap `fakeDecode` for an actual codec call; the plan does not change).
 */
object Multimodal {

  case class MediaRow(doc_id: Long, modality: String, n_bytes: Int,
                      payload: Array[Byte])
  case class MediaFeature(doc_id: Long, modality: String, n_bytes: Int,
                          feature: Array[Double], payload_md5: String)

  /** Wrap a text table as binary media rows (payload = UTF-8 bytes), with a
    * deterministic modality route — stands in for an ingest of image/audio
    * blobs with the same schema. */
  def asMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
        // octet_length, not length: n_bytes must measure the PAYLOAD (the
        // UTF-8 byte encoding), not the character count — they diverge on
        // any non-ASCII text, and n_bytes sizes decode/frame buffers when
        // the stub decode is swapped for a real codec
        octet_length(col("text")).cast("int").as("n_bytes"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB DECODE — deterministic fake: 8-dim feature from payload bytes via
    * seeded hashing. A real implementation would decode the codec here
    * (e.g. JPEG → pixels → pooled embedding); signature and batch shape
    * are identical. */
  private def fakeDecode(payload: Array[Byte], dim: Int = 8): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      val h = Hashing.xxh64(payload, 0, payload.length, 0xFEED0000L + i)
      out(i) = (h.toDouble / Long.MaxValue) // [-1, 1]
      i += 1
    }
    out
  }

  /** Batched feature extraction: one narrow mapPartitions pass, exactly the
    * shape of the reference's batched CLIP embedding loop
    * (/root/reference/duplicate_detector/core/similarity_engine.py:107-139).
    * At scale this is where GPU/codec batching happens per partition. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // one digest instance per task (digest() resets it), not per row —
      // getInstance is a provider lookup + allocation on the hot path
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val md5 = md.digest(m.payload).map("%02x".format(_)).mkString
        MediaFeature(m.doc_id, m.modality, m.n_bytes,
          fakeDecode(m.payload), md5)
      }
    }
  }

  /** Metadata + checksum projection (SQL-oracle-able: md5 of the payload
    * equals md5 of the source text). */
  def mediaManifest(docs: DataFrame): DataFrame =
    asMedia(docs).toDF()
      .select(col("doc_id"), col("modality"), col("n_bytes").cast("long").as("n_bytes"),
        md5(col("payload")).as("payload_md5"))

  case class MediaFrame(doc_id: Long, frame_idx: Int, n_bytes: Int,
                        frame_md5: String)

  /** FRAME SAMPLING (video/audio analog): split each payload into
    * fixed-size frames and keep every k-th — the generator (flatMap)
    * pattern over binary columns; a production pipeline would hand each
    * sampled frame to the decoder. Pure plumbing, no codec needed. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64,
                  everyK: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val n = m.payload.length
      val nFrames = (n + frameBytes - 1) / frameBytes
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until nFrames).iterator.filter(_ % everyK == 0).map { f =>
        val lo = f * frameBytes
        val hi = math.min(n, lo + frameBytes)
        val hex = md.digest(java.util.Arrays.copyOfRange(m.payload, lo, hi))
          .map("%02x".format(_)).mkString
        md.reset()
        MediaFrame(m.doc_id, f, hi - lo, hex)
      }
    }
  }

  /** RESIZE (1-D signal resample): average-pool the payload bytes into a
    * fixed number of windows — output dimensionality is constant regardless
    * of input size, exactly the contract an image/audio resize has. This is
    * a REAL computation (mean byte value per window), not a stub. */
  def resize(media: Dataset[MediaRow], dim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      val n = m.payload.length
      val out = new Array[Double](dim)
      var w = 0
      while (w < dim) {
        val lo = (n.toLong * w / dim).toInt
        val hi = math.max(lo + 1, (n.toLong * (w + 1) / dim).toInt)
        var s = 0.0; var i = lo
        while (i < math.min(hi, n)) { s += (m.payload(i) & 0xFF); i += 1 }
        out(w) = if (hi > lo && lo < n) s / (math.min(hi, n) - lo) else 0.0
        w += 1
      }
      (m.doc_id, m.modality, out)
    }.toDF("doc_id", "modality", "resized")
  }
}
