package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, processed batch-at-a-time inside partitions.
  *
  * The container has no image/audio codecs, so `decode` is a clearly
  * marked deterministic stub — but everything Spark-side is real and
  * load-bearing: the schema (binary payload + struct metadata), the
  * `mapPartitions` batch shape (the Scala analogue of `mapInPandas` —
  * one iterator per partition, no per-row task overhead, constant memory),
  * and the partitioning contract (payloads never shuffle; derived features
  * do).
  */
object Multimodal {

  /** One media row: payload stays opaque; metadata travels alongside.
    * CONTRACT: `payload` is never null — absent media is an EMPTY array
    * ([[fromDocuments]] normalizes at the boundary); the per-partition
    * decoders rely on it. Metadata columns are NULLABLE (`Option` /
    * reference types): real dumps drop metadata independently of the
    * media bytes, and a non-null assert here turns an absent annotation
    * into a job-killing executor exception. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                            meta_lang: String, meta_chars: Option[Long])

  /** Extracted features — what a real decoder (image resize, audio
    * frame-sample) would emit per row. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 first_byte: Int, n_frames: Long, checksum: Long)

  /** Build a media table from the `documents` testdata table, treating the
    * utf-8 text bytes as the opaque payload (stands in for jpeg/wav bytes;
    * the plumbing — binary column, metadata struct — is the real part). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("kind"),
      // null text normalizes to an EMPTY payload at the boundary — the
      // typed MediaRow contract is a non-null byte array (a null payload
      // would NPE inside every mapPartitions task, killing the job after
      // retries), and "no media bytes" decodes the same as zero bytes
      encode(coalesce(col("text"), lit("")), "UTF-8").as("payload"),
      col("lang").as("meta_lang"),
      col("n_chars").as("meta_chars"))

  /** STUB decoder — deterministic fake standing in for the real codec
    * call (`???` boundary). A production build links an actual decoder
    * here; signature and batch shape stay identical. `n_frames` is
    * ceil(bytes / 100) — EXACTLY the number of FrameRows [[sampleFrames]]
    * emits at its default frameSize, so `count(frames) == n_frames` holds
    * per document (the previous `len/100 + 1` over-counted by one on
    * empty payloads and exact multiples of 100, breaking any consumer
    * joining the two faces). */
  private def decodeStub(payload: Array[Byte]): (Int, Long, Long) = {
    val first = if (payload.isEmpty) -1 else payload(0) & 0xff
    val frames = (payload.length + 99L) / 100L       // "frame-sample" stub
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xffL); i += 1 }
    (first, frames, sum)
  }

  /** Batch feature extraction via mapPartitions: the iterator-in /
    * iterator-out shape means one JVM-side pass per partition, mirroring
    * `mapInPandas`' arrow-batch contract. No shuffle — features are
    * computed where the payload bytes already live. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (first, frames, sum) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, first, frames, sum)
      }
    }
  }

  /** End-to-end: documents → media rows → per-partition decode →
    * features. */
  def documentFeatures(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    extractFeatures(fromDocuments(docs).as[MediaRow])
  }

  /** One sampled frame: offset/length into the payload + stub checksum
    * (a real decoder emits pixel/PCM buffers; same row shape). */
  final case class FrameRow(media_id: Long, frame_idx: Int, offset: Long,
                            n_bytes: Long, checksum: Long)

  /** Frame sampling — the ONE-TO-MANY decode shape (each media row yields
    * N frame rows), the form real video/audio extraction takes under
    * `mapInPandas`/`flatMap`: iterator-in/iterator-out per partition, no
    * shuffle, output fan-out bounded by payload size. The stub "frame" is
    * a `frameSize`-byte slice with an unsigned-byte checksum; a real
    * build swaps the slicer for a codec and keeps the row shape. */
  def sampleFrames(media: Dataset[MediaRow], frameSize: Int = 100): Dataset[FrameRow] = {
    // grouped(0) throws inside every executor task (opaque, after
    // retries); fail on the driver instead
    require(frameSize > 0, s"frameSize must be positive: $frameSize")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        r.payload.grouped(frameSize).zipWithIndex.map { case (bytes, i) =>
          var sum = 0L
          var j = 0
          while (j < bytes.length) { sum += (bytes(j) & 0xffL); j += 1 }
          FrameRow(r.media_id, i, i.toLong * frameSize, bytes.length.toLong, sum)
        }
      }
    }
  }
}
