package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.{Par, QueryDef, Tables}

/** Multimodal-column plumbing: media (image/audio/video) modeled as opaque
  * `binary` columns with typed metadata, plus a decode/feature-extract stage.
  *
  * The testdata has no binary media table, so media bytes are derived
  * deterministically from `documents.text` (utf-8 encode) — the POINT is the
  * Spark-side plumbing: schema, batch iteration shape, partition-parallel
  * decode, and pushdown-friendly metadata extraction. The decode itself is a
  * STUB (this container has no image/audio codecs): [[StubDecoder]] parses
  * fake deterministic "headers" from the first bytes. Swapping in a real
  * codec (JNI/javacv) changes only that function — the mapPartitions
  * harness, row schema and partitioning are production-shaped.
  *
  * At 100 TB: decode is the classic CPU-heavy embarrassingly-parallel stage —
  * `mapPartitions` keeps codec state (a real decoder context) per partition
  * rather than per row; metadata-only queries (the oracle-checked
  * `multimodal_meta`) never touch the decoder and stay in whole-stage
  * codegen, reading only the pruned columns.
  */
object Multimodal {

  /** Opaque media blob + stable id, derived from documents. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id").as("media_id"),
      col("source"),
      col("text").cast("binary").as("media"))

  /** Decoded-frame metadata schema — what a real image/video decode emits. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("mean_luma", LongType, nullable = false)))

  /** STUB decoder: parses a deterministic fake header from the blob.
    * A real implementation would hand `bytes` to an image/audio codec here;
    * everything around it (batching, schema, parallelism) stays as-is.
    */
  object StubDecoder {
    def decode(mediaId: Long, bytes: Array[Byte]): Row = {
      val len = bytes.length
      val w = 64 + (len % 576)
      val h = 64 + ((len * 7) % 416)
      // "mean luma": floor-average of the first 16 byte values — a stand-in
      // for a real pixel statistic; integer math keeps it oracle-exact
      val head = bytes.take(16)
      val luma = if (head.isEmpty) 0L
        else head.map(b => (b & 0xff).toLong).sum / head.length
      Row(mediaId, w, h, 1 + (mediaId % 24).toInt, luma)
    }
  }

  /** Partition-parallel decode: one decoder context per partition (the real
    * codec would be instantiated once here), rows streamed through it.
    */
  def decodeAll(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = RowEncoder.encoderFor(decodedSchema)
    Par.spread(media.select("media_id", "media")).mapPartitions { rows =>
      // real path: val codec = Codec.open(); rows.map(... codec.decode ...)
      rows.map(r => StubDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)))
    }(enc)
  }

  /** Frame sampling: every `everyK`-th frame index of each decoded media
    * row — the standard video pre-processing step (a real pipeline would
    * hand each sampled index back to the codec for extraction).
    */
  def sampleFrames(decoded: DataFrame, everyK: Int): DataFrame =
    decoded.select(col("media_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(everyK)))
        .as("frame_idx"))

  /** Resize metadata: fit (width, height) into a `maxW`×`maxH` box
    * preserving aspect ratio — integer arithmetic only (scale by the
    * limiting dimension; never upscale). The pixel resample itself belongs
    * to the stubbed codec; this computes the target geometry every
    * downstream stage needs.
    */
  def resizeMeta(decoded: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val w = col("width")
    val h = col("height")
    // scale numerator/denominator: min(maxW/w, maxH/h, 1) as a rational
    val byWidth = w * maxH <= h * maxW // width is NOT the limiting side?
    val (num, den) = (when(byWidth, lit(maxH)).otherwise(lit(maxW)),
      when(byWidth, h).otherwise(w))
    val noShrink = w <= maxW && h <= maxH
    decoded.select(col("media_id"), w.as("width"), h.as("height"),
      when(noShrink, w).otherwise((w * num) / den).cast("int").as("out_w"),
      when(noShrink, h).otherwise((h * num) / den).cast("int").as("out_h"))
  }

  val all: Seq[QueryDef] = Seq(
    // Metadata-only rollup over the media blobs: byte sizes per source.
    // Never touches the decoder — stays codegen'd, scans only 3 columns.
    QueryDef("multimodal_meta",
      (s, d) => mediaTable(s, d)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_media"),
          sum(octet_length(col("media")).cast("long")).as("total_bytes"),
          max(octet_length(col("media")).cast("long")).as("max_bytes"),
          min(octet_length(col("media")).cast("long")).as("min_bytes"))
        .orderBy("source"),
      Some("""SELECT source, COUNT(*) AS n_media,
             |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             |  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
             |  CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes
             |FROM documents GROUP BY source
             |ORDER BY source""".stripMargin)),

    // Decoded-frame feature rollup: exercises the mapPartitions decode path
    // end-to-end. Stub decode is deterministic integer/double arithmetic, so
    // the oracle can replay it in SQL.
    QueryDef("multimodal_decode",
      (s, d) => decodeAll(mediaTable(s, d))
        .groupBy("n_frames")
        .agg(
          count(lit(1)).as("n_media"),
          sum((col("width") * col("height")).cast("long")).as("total_px"),
          sum(col("mean_luma")).as("sum_luma"))
        .orderBy("n_frames"),
      // text is ASCII, so byte i of the utf-8 blob == ascii(substr(text,i,1))
      Some("""SELECT CAST(1 + doc_id % 24 AS INT) AS n_frames, COUNT(*) AS n_media,
             |  CAST(SUM(CAST(64 + octet_length(encode(text)) % 576 AS BIGINT)
             |         * (64 + (octet_length(encode(text)) * 7) % 416)) AS BIGINT) AS total_px,
             |  CAST(SUM(luma) AS BIGINT) AS sum_luma
             |FROM (
             |  SELECT doc_id, text,
             |    list_aggregate(list_transform(
             |      generate_series(1, least(16, length(text))),
             |      i -> ascii(substr(text, i, 1))), 'sum')
             |      // least(16, length(text)) AS luma
             |  FROM documents)
             |GROUP BY 1 ORDER BY n_frames""".stripMargin)),

    // Frame sampling (every 4th frame) through the decode harness: one row
    // per sampled frame, rolled up per media. Oracle replays the stub's
    // frame count and the stepped sequence.
    QueryDef("multimodal_frames",
      (s, d) => sampleFrames(decodeAll(mediaTable(s, d)), everyK = 4)
        .groupBy("media_id", "n_frames")
        .agg(count(lit(1)).as("sampled"), max(col("frame_idx")).as("last_idx"))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id, CAST(1 + doc_id % 24 AS INT) AS n_frames,
             |  CAST(len(generate_series(0, doc_id % 24, 4)) AS BIGINT) AS sampled,
             |  CAST(list_max(generate_series(0, doc_id % 24, 4)) AS INT) AS last_idx
             |FROM documents ORDER BY media_id""".stripMargin))
  )
}
