package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY §2.4): media as opaque binary
  * payloads + typed metadata, processed partition-wise.
  *
  * The decode step is STUBBED (this container has no image/audio
  * codecs): `FakeDecoder` derives deterministic pseudo-dimensions from
  * the payload hash. Everything around it — binary column packing,
  * metadata struct schema, per-partition decoder lifecycle in
  * `extractFeatures` (init-once-per-partition, the exact shape a real
  * libjpeg/ffmpeg binding needs), batch sizing via partitions — is
  * real and tested.
  */
object BinaryColumns {

  /** Pack content into (id, payload binary, meta struct). For real
    * media the payload is the raw bytes; here text bytes stand in. */
  def packPayload(df: DataFrame, idCol: Column, contentCol: Column, kind: String): DataFrame =
    df.select(
      idCol.as("id"),
      encode(contentCol, "UTF-8").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        lit(kind).as("kind"),
        md5(col("payload")).as("checksum")))

  /** Pack ALREADY-BINARY content (e.g. rows from Tables.readBinaryFiles)
    * into the same (id, payload, meta) shape — the ingest join point
    * between the binaryFile source and the feature extractors. */
  def packBinary(df: DataFrame, idCol: Column, payloadCol: Column, kind: String): DataFrame =
    df.select(idCol.as("id"), payloadCol.as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        lit(kind).as("kind"),
        md5(col("payload")).as("checksum")))

  /** STUB decoder: deterministic fake dims from a payload hash. A real
    * implementation swaps `decode` for a codec call; the partition
    * lifecycle and output schema stay identical. The fake is pure
    * arithmetic — UTF-8-decode the payload, fold code points
    * (acc·31 + cp) mod 2^31 with a Knuth multiplicative finalizer —
    * so even the STUB is gated by a full DuckDB oracle (the oracle
    * replays the fold over the source text): the plumbing test
    * catches schema/partitioning/ordering regressions with hash
    * precision, not just row counts. */
  private object FakeDecoder {
    final case class Features(width: Int, height: Int, channels: Int)
    def decode(payload: Array[Byte]): Features = {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      var h = 0L
      var idx = 0
      while (idx < s.length) {
        val cp = s.codePointAt(idx)
        h = (h * 31L + cp) % 2147483648L
        idx += Character.charCount(cp)
      }
      h = (h * 2654435761L) % 2147483648L
      Features(
        width = 64 + (h % 1857L).toInt,
        height = 64 + ((h >> 17) % 1017L).toInt,
        channels = 3)
    }
  }

  /** REAL partition-wise media decoding (round 4): parse BMP/PNG/WAV
    * headers from binary payloads via MediaCodec — the same
    * init-once-per-partition lifecycle as extractFeatures, on real
    * format-compliant bytes instead of the arithmetic stub. */
  def decodeMedia(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val m = MediaCodec.decode(payload)
          (id, m.format, m.width, m.height, m.channels, m.sampleRate, m.durationMs)
        }
      }.toDF("id", "format", "width", "height", "channels",
        "sample_rate", "duration_ms")
  }

  /** Partition-wise feature extraction over packed payloads: one
    * decoder instance per partition (the init-heavy-codec shape),
    * streaming through rows without collecting. */
  def extractFeatures(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = packed
      .select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      val decoder = FakeDecoder // real codec: open once per partition
      rows.map { case (id, payload) =>
        val f = decoder.decode(payload)
        (id, f.width, f.height, f.channels, payload.length.toLong)
      }
    }.toDF("id", "width", "height", "channels", "n_bytes")
  }
}
