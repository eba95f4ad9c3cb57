package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * operators.
  *
  * The decode step is a DETERMINISTIC STUB — this container has no media
  * libraries, so "decoding" derives pseudo-metadata from the bytes
  * (hash-based), clearly marked below. Everything around it — the asset
  * schema, batch shape, chunking, size-aware partitioning — is real Spark
  * plumbing and is what matters at 100 TB: media bytes never pass through a
  * shuffle unless the operator genuinely needs them to, and all metadata ops
  * are codegen'd column expressions over the binary column.
  */
object Multimodal {

  /** Canonical media-asset schema: opaque payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType), // "image" | "audio" | "video"
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType),
    ))),
  ))

  /** Big-endian u32 read from a binary column at 1-based `off`: hex() the
    * 4-byte slice, parse base-16. Pure codegen'd expressions — no UDF. */
  private def beU32(content: Column, off: Int): Column =
    conv(hex(substring(content, off, 4)), 16, 10).cast(LongType)

  /** Little-endian u32: same single-byte reads, weighted by 256^i. */
  private def leU32(content: Column, off: Int): Column =
    (0 until 4).map { i =>
      conv(hex(substring(content, off + i, 1)), 16, 10).cast(LongType) * lit(1L << (8 * i))
    }.reduce(_ + _)

  private def magicIs(content: Column, off: Int, hexBytes: String): Column =
    hex(substring(content, off, hexBytes.length / 2)) === lit(hexBytes)

  /** u8 / big-endian u16 at a DATA-DEPENDENT 1-based offset (Column, not
    * Int): `substr(Column, Column)` + hex/conv — still pure expressions. */
  private def u8At(content: Column, off: Column): Column =
    conv(hex(content.substr(off, lit(1))), 16, 10).cast(IntegerType)

  private def beU16At(content: Column, off: Column): Column =
    conv(hex(content.substr(off, lit(2))), 16, 10).cast(IntegerType)

  /** 1-based offset of the JPEG SOF0/SOF2 marker (0xFFC0 / 0xFFC2), or
    * null if not found within [[MaxJpegSegments]] segments.
    *
    * JPEG segments are length-prefixed, so the frame header sits at a
    * data-dependent offset — a fixed-offset read can't find it. The walk
    * is a bounded fold over the segment chain via the `aggregate`
    * higher-order function: state = (cursor, found-offset); each step
    * either records the SOF offset or advances cursor by the segment's
    * big-endian length field (which counts itself but not the marker).
    * A per-element lambda keeps the expression tree LINEAR in the step
    * count — the naive unrolled `when`-chain duplicates the cursor
    * subtree per step and blows up exponentially. Out-of-bounds and
    * non-0xFF garbage collapse the state to null, which routes the row
    * to the stub fallback rather than decoding garbage.
    */
  val MaxJpegSegments = 32

  private def jpegSofOffset(content: Column): Column = {
    val nullOff = lit(null).cast(LongType)
    val scan = aggregate(
      sequence(lit(1), lit(MaxJpegSegments)),
      struct(lit(3L).as("off"), nullOff.as("sof")),
      (acc, _) => {
        val off = acc.getField("off")
        val sof = acc.getField("sof")
        // SOF payload is ≥ 8 bytes past the marker (len, precision, h, w)
        val inBounds = off.isNotNull && off + lit(9L) <= octet_length(content)
        val mark = beU16At(content, off)
        val isSof = inBounds && (mark === 0xFFC0 || mark === 0xFFC2)
        val isMarker = inBounds && u8At(content, off) === 0xFF
        val segLen = beU16At(content, off + lit(2L)).cast(LongType)
        when(sof.isNotNull, acc).otherwise(struct(
          when(isSof || !isMarker, nullOff)
            .otherwise(off + lit(2L) + segLen).as("off"),
          when(isSof, off).otherwise(nullOff).as("sof")))
      })
    scan.getField("sof")
  }

  /** Decode (width, height, n_frames, sample_rate) from the payload.
    *
    * REAL header parses, as pure column expressions over the binary
    * column (no UDF, no media library):
    *   - PNG: 8-byte signature, then the IHDR chunk at a fixed offset —
    *     width/height are big-endian u32 at bytes 17/21 (1-based);
    *   - WAV: "RIFF....WAVE" signature with the CANONICAL fmt chunk at
    *     byte 13 — sample rate is little-endian u32 at byte 25. A
    *     non-canonical RIFF (LIST/INFO chunk before fmt) deliberately
    *     falls through to the stub rather than decoding garbage;
    *   - JPEG: FFD8FF signature, then a bounded walk of the
    *     length-prefixed segment chain to the SOF0/SOF2 frame header
    *     ([[jpegSofOffset]]) — height/width are big-endian u16 at +5/+7
    *     past the marker.
    *
    * Every other format falls back to the DETERMINISTIC STUB (hash-derived
    * pseudo-metadata): this container has no codecs for mp3/mp4, and
    * a wrong-but-deterministic value beats a silent ???. A real deployment
    * swaps the fallback for a decoder behind the same column contract —
    * schema, null handling, and plan shape stay identical.
    */
  def decodeMeta(content: Column): Column = {
    val h = abs(xxhash64(content))
    val nullInt = lit(null).cast(IntegerType)
    val isPng = octet_length(content) >= 24 &&
      magicIs(content, 1, "89504E470D0A1A0A") && magicIs(content, 13, "49484452") // "IHDR"
    val isWav = octet_length(content) >= 44 &&
      magicIs(content, 1, "52494646") && magicIs(content, 9, "57415645") && // "RIFF"/"WAVE"
      magicIs(content, 13, "666D7420") // "fmt " — guards byte-25 sample-rate read
    val isJpeg = octet_length(content) >= 4 && magicIs(content, 1, "FFD8FF")
    val sof = jpegSofOffset(content)
    when(isPng, struct(
        beU32(content, 17).cast(IntegerType).as("width"),
        beU32(content, 21).cast(IntegerType).as("height"),
        lit(1).cast(IntegerType).as("n_frames"),
        nullInt.as("sample_rate")))
      .when(isWav, struct(
        nullInt.as("width"),
        nullInt.as("height"),
        nullInt.as("n_frames"),
        leU32(content, 25).cast(IntegerType).as("sample_rate")))
      .when(isJpeg && sof.isNotNull, struct(
        beU16At(content, sof + lit(7L)).as("width"),
        beU16At(content, sof + lit(5L)).as("height"),
        lit(1).cast(IntegerType).as("n_frames"),
        nullInt.as("sample_rate")))
      .otherwise(struct(
        (h % 1920 + 1).cast(IntegerType).as("width"),
        (h % 1080 + 1).cast(IntegerType).as("height"),
        (h % 240 + 1).cast(IntegerType).as("n_frames"),
        lit(16000).cast(IntegerType).as("sample_rate")))
  }

  /** Attach decoded metadata to a raw (asset_id, media_type, content) frame. */
  def withMeta(assets: DataFrame): DataFrame =
    assets.withColumn("meta", decodeMeta(col("content")))

  /** Media-lake ingest via Spark's built-in `binaryFile` source: a directory
    * of media files becomes (asset_id, media_type, content) rows — asset id
    * as a stable hash of the path, media type from the extension. The
    * source never splits a file, pushes `pathGlobFilter` down to listing,
    * and caps memory per task via files.maxPartitionBytes — the correct
    * ingestion path for billions of objects (listing parallelizes; bytes
    * stream straight from storage into the binary column).
    */
  def readMediaDir(spark: org.apache.spark.sql.SparkSession, dir: String,
      glob: Option[String] = None): DataFrame = {
    val r0 = spark.read.format("binaryFile")
    val reader = glob.fold(r0)(g => r0.option("pathGlobFilter", g))
    val ext = element_at(split(col("path"), "\\."), -1)
    reader.load(dir)
      .select(
        xxhash64(col("path")).as("asset_id"),
        when(ext.isin("jpg", "jpeg", "png", "gif"), "image")
          .when(ext.isin("wav", "mp3", "flac"), "audio")
          .when(ext.isin("mp4", "avi", "mkv"), "video")
          .otherwise("binary").as("media_type"),
        col("content"),
        col("path"),
        col("length").as("byte_length"),
      )
  }

  /** STUB resize: a real implementation transcodes `content`; the stub
    * rewrites only the metadata, preserving the exact operator contract
    * (same columns in, same columns out).
    */
  def resize(assets: DataFrame, width: Int, height: Int): DataFrame =
    assets.withColumn("meta",
      col("meta").withField("width", lit(width))
        .withField("height", lit(height)))

  /** Frame sampling: split the payload into `frameBytes`-sized chunks and
    * keep every `stride`-th chunk. Pure column expressions
    * (sequence/transform/substring on binary) — codegen'd, no UDF; the
    * explode multiplies rows, never bytes (each output row carries one
    * chunk, not the whole asset).
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nChunks = ceil(octet_length(col("content")).cast("double") / lit(frameBytes)).cast("int")
    assets
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), nChunks - 1), i => i % stride === 0)))
      .withColumn("frame",
        expr(s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)"))
      .drop("content")
  }

  /** Size-aware repartitioning: media rows are heavily skewed by payload
    * size; bucketing by log2(size) bands before heavy per-asset work keeps
    * task durations even (the scale-path answer to one 4 GB video pinning a
    * task while 10k thumbnails finish).
    */
  def repartitionBySize(assets: DataFrame, partitions: Int): DataFrame =
    assets
      .withColumn("size_band", floor(log2(octet_length(col("content")) + lit(1))))
      .repartition(partitions, col("size_band"), col("asset_id"))
      .drop("size_band")
}
