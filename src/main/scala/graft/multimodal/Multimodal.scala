package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata, processed per-partition with
  * typed Datasets.
  *
  * Container-header parsing (PNG / JPEG / GIF magic bytes +
  * dimensions) is REAL — `parseImageHeader` below reads the actual
  * byte layout. Full pixel/audio decoding is STUBBED with a
  * deterministic fake (the codec libraries are not in this container):
  * the Spark-side plumbing (schema, encoders, partitioning, batch
  * shape) is real and testable, and swapping the fallback branch of
  * `decodeFeatures` for a real codec changes nothing else.
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
      format: String, // png | jpeg | gif | unknown (header-detected)
      width: Int, // real for recognized headers; derived fake otherwise
      height: Int)

  /** Parse a real image container header: magic bytes + dimensions.
    * Returns (format, width, height). No codec needed — these fields
    * live at fixed/locatable offsets in the container byte layout:
    *  - PNG:  8-byte signature, then the IHDR chunk carries width and
    *    height as big-endian u32 at offsets 16 and 20.
    *  - JPEG: FF D8 start-of-image, then a marker-segment walk to the
    *    first SOFn (C0-CF minus C4/C8/CC), whose payload is
    *    [precision u8][height u16][width u16] big-endian.
    *  - GIF:  "GIF87a"/"GIF89a", then width and height as
    *    little-endian u16 at offsets 6 and 8.
    *  - BMP:  "BM", then width and height as little-endian i32 at
    *    offsets 18 and 22 (BITMAPINFOHEADER; height may be negative
    *    for top-down rows — reported as its magnitude). */
  def parseImageHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)

    if (bytes.length >= 26 && u8(0) == 'B' && u8(1) == 'M' &&
      le32(14) >= 40) // BITMAPINFOHEADER or later
      Some(("bmp", le32(18), math.abs(le32(22))))
    else if (bytes.length >= 24 &&
      u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' && u8(3) == 'G' &&
      u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a &&
      bytes.slice(12, 16).sameElements("IHDR".getBytes))
      Some(("png", be32(16), be32(20)))
    else if (bytes.length >= 10 &&
      bytes.slice(0, 6).sameElements("GIF87a".getBytes) ||
      bytes.length >= 10 && bytes.slice(0, 6).sameElements("GIF89a".getBytes))
      Some(("gif", le16(6), le16(8)))
    else if (bytes.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // marker-segment walk to the first start-of-frame
      var i = 2
      while (i + 3 < bytes.length) {
        if (u8(i) != 0xff) return None // desynced — not a well-formed JPEG
        var m = u8(i + 1)
        while (m == 0xff && i + 2 < bytes.length) { i += 1; m = u8(i + 1) } // fill bytes
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          return if (i + 8 < bytes.length)
            Some(("jpeg", be16(i + 7), be16(i + 5)))
          else None
        } else if ((m >= 0xd0 && m <= 0xd9) || m == 0x01) {
          i += 2 // standalone marker, no length field
        } else {
          if (i + 3 >= bytes.length) return None
          i += 2 + be16(i + 2)
        }
      }
      None
    } else None
  }

  /** Parsed WAV audio metadata — every field read from the real RIFF
    * byte layout, no codec involved. */
  final case class WavInfo(
      media_id: Long,
      channels: Int,
      sample_rate: Int,
      bits_per_sample: Int,
      data_bytes: Long,
      duration_ms: Long)

  /** Parse a real RIFF/WAVE container header: "RIFF"+"WAVE" magic, then
    * a chunk walk ([id u32]["size" LE u32][data], word-aligned) to the
    * "fmt " chunk (channels LE u16 @+2, sample rate LE u32 @+4, bits
    * per sample LE u16 @+14 of its payload) and the "data" chunk (its
    * size = raw PCM byte count). Returns (channels, sampleRate,
    * bitsPerSample, dataBytes). */
  def parseWavHeader(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (bytes.length < 44 ||
      !bytes.slice(0, 4).sameElements("RIFF".getBytes) ||
      !bytes.slice(8, 12).sameElements("WAVE".getBytes)) return None
    var i = 12
    var channels = -1
    var rate = -1L
    var bits = -1
    var dataBytes = -1L
    while (i + 8 <= bytes.length && (channels < 0 || dataBytes < 0)) {
      val id = new String(bytes, i, 4, "ISO-8859-1")
      val size = le32(i + 4)
      if (id == "fmt " && i + 24 <= bytes.length) {
        channels = le16(i + 10)
        rate = le32(i + 12)
        bits = le16(i + 22)
      } else if (id == "data") {
        dataBytes = size
      }
      if (channels >= 0 && dataBytes >= 0) {
        i = bytes.length // both chunks found — no need to walk further
      } else {
        // Advance in Long: a chunk size near 2^32 (e.g. 0xFFFFFFF8) would
        // make the Int advance zero or negative and spin the loop forever.
        val next = i.toLong + 8L + size + (size & 1L) // word-aligned chunks
        if (next <= i || next > Int.MaxValue) return None // corrupt size
        i = next.toInt
      }
    }
    if (channels > 0 && rate > 0 && bits > 0 && dataBytes >= 0)
      Some((channels, rate.toInt, bits, dataBytes))
    else None
  }

  /** Audio metadata table from WAV payloads: one row per payload whose
    * RIFF header parses; the duration is exact integer arithmetic over
    * the header fields. Payloads are projected away immediately — at
    * 100 TB only these few columns ever shuffle. */
  def audioInfo(media: Dataset[MediaRow]): Dataset[WavInfo] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseWavHeader(r.payload).map { case (ch, rate, bits, dataBytes) =>
          WavInfo(
            media_id = r.media_id,
            channels = ch,
            sample_rate = rate,
            bits_per_sample = bits,
            data_bytes = dataBytes,
            duration_ms =
              dataBytes * 8000L / (rate.toLong * ch.toLong * bits.toLong))
        }
      }
    }
  }

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

  /** Per-asset features: REAL container-header parse for recognized
    * formats (PNG/JPEG/GIF dimensions straight from the byte layout);
    * unrecognized payloads fall back to a deterministic fake (stable
    * across partitionings and engines) in place of a pixel decode —
    * swap that branch for a codec to productionize. */
  private def decodeFeatures(r: MediaRow): MediaFeatures = {
    val bytes = r.payload
    var sum = 0L
    var i = 0
    while (i < bytes.length) { // per-partition tight loop, no boxing
      sum = sum * 31 + (bytes(i) & 0xff)
      i += 1
    }
    val (format, width, height) = parseImageHeader(bytes).getOrElse {
      val fakeWidth = ((sum % 1024) + 1024).toInt % 1024 + 1
      ("unknown", fakeWidth, fakeWidth * 3 / 4)
    }
    MediaFeatures(
      media_id = r.media_id,
      kind = r.kind,
      byte_len = bytes.length.toLong,
      header_byte = if (bytes.nonEmpty) bytes(0) & 0xff else -1,
      checksum = sum,
      format = format,
      width = width,
      height = height)
  }

  /** Feature extraction over partitions: the mapPartitions boundary is
    * where a real decoder would amortize codec init per partition
    * (exactly the pandas-UDF batch shape, in typed-Dataset form). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.open() once per partition
      rows.map(decodeFeatures)
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
