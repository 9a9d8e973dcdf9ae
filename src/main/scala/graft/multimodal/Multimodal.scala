package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata, processed per-partition with
  * typed Datasets.
  *
  * The actual media decoding (JPEG/PNG/ffmpeg) is STUBBED — the image
  * and audio libraries are not in this container — with a clearly
  * deterministic fake so the Spark-side plumbing (schema, encoders,
  * partitioning, batch shape) is real and testable. Swap
  * `decodeStub`'s body for a real codec to productionize; nothing else
  * changes.
  */
object Multimodal {

  /** One media asset: payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      declared_format: String)

  /** Extracted features per asset. At 100 TB these rows are tiny
    * relative to payloads — the feature extraction projects payloads
    * away as early as possible so downstream stages never shuffle the
    * binary column. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      header_byte: Int,
      checksum: Long, // deterministic payload checksum
      width: Int, // STUB: derived, not decoded
      height: Int)

  /** Wrap any table with a string payload column as a media table —
    * used by tests and the demo queries to fabricate binary payloads
    * deterministically. */
  def asMediaTable(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      kind: String = "image"): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      col(payloadCol).cast("binary").as("payload"),
      lit("fake/raw").as("declared_format"))
      .as[MediaRow]
  }

  /** STUB decode: a real implementation would parse the image header
    * and decode pixels here. The fake derives every field
    * deterministically from the payload bytes so results are stable
    * across partitionings and engines. */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { // per-partition tight loop, no boxing
      sum = sum * 31 + (bytes(i) & 0xff)
      i += 1
    }
    val fakeWidth = ((sum % 1024) + 1024).toInt % 1024 + 1
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = bytes.length.toLong,
      header_byte = if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      checksum = sum,
      width = fakeWidth,
      height = fakeWidth * 3 / 4)
  }

  /** Feature extraction over partitions: the mapPartitions boundary is
    * where a real decoder would amortize codec init per partition
    * (exactly the pandas-UDF batch shape, in typed-Dataset form). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() once per partition
      rows.map(decodeStub)
    }
  }

  /** STUB resize: a real implementation would decode, scale, and
    * re-encode; the fake deterministically downsamples the payload
    * bytes by `factor` (every factor-th byte), preserving the
    * binary-in/binary-out plumbing shape and a predictable size
    * contract (len/factor, rounded up). */
  def resize(media: Dataset[MediaRow], factor: Int = 4): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        val out = new Array[Byte]((n + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * factor); i += 1 }
        r.copy(payload = out, declared_format = s"${r.declared_format};resized/$factor")
      }
    }
  }

  /** STUB frame sampling for video payloads: every `stride`-th fixed-
    * size chunk stands in for a decoded frame. Output is exploded to
    * one row per frame — the shape a real frame sampler produces. */
  def sampleFrames(
      media: Dataset[MediaRow],
      frameBytes: Int = 64,
      stride: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = r.payload.length / frameBytes
      (0 until n by stride).map { f =>
        val frame = java.util.Arrays.copyOfRange(
          r.payload, f * frameBytes, (f + 1) * frameBytes)
        (r.media_id, f, frame.length, frame.map(_ & 0xff).sum)
      }
    }.toDF("media_id", "frame_no", "frame_bytes", "frame_weight")
  }
}
