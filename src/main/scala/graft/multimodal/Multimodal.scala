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
      StructField("bitrate_kbps", IntegerType),
      StructField("duration_ms", LongType),
      StructField("brand", StringType),
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

  /** Little-endian u16 at a fixed 1-based offset. */
  private def leU16(content: Column, off: Int): Column =
    conv(hex(substring(content, off, 1)), 16, 10).cast(LongType) +
      conv(hex(substring(content, off + 1, 1)), 16, 10).cast(LongType) * lit(256L)

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

  /** Big-endian u32 at a data-dependent 1-based offset. */
  private def beU32At(content: Column, off: Column): Column =
    conv(hex(content.substr(off, lit(4))), 16, 10).cast(LongType)

  /** 1-based offset of the first ISO-BMFF box whose 4CC is `fourccHex`,
    * scanning the sibling chain from `start` while boxes stay inside
    * `endIncl` — or null. Same bounded-fold shape as [[jpegSofOffset]]:
    * each MP4 box is [u32 size]["4cc "], siblings are size-chained, and
    * the walk gives up (null ⇒ stub fallback) on a size < 8 (64-bit or
    * to-end sizes are not worth decoding header-only), an out-of-bounds
    * box, or [[MaxBoxes]] steps. Nested walks compose by starting at
    * `found + 8` bounded by the found box's own end.
    */
  val MaxBoxes = 16

  /** Let-binding for column expressions, via a one-element higher-order
    * `transform`: binds `bound` as a named lambda variable so `body` can
    * reference it any number of times WITHOUT duplicating its subtree.
    *
    * Why it exists: the data-dependent offset chains here nest (tkhd is
    * found inside trak inside moov, and each level reads the level below
    * 2-3 times), so inlining Columns multiplies the tree ~3× per level —
    * the un-let decodeMeta measured ~20 s of CATALYST OPTIMIZER time and
    * ~12 s per execution on a 2-row frame, all spent walking a
    * combinatorially duplicated expression tree, not reading bytes. With
    * the bindings the whole decode optimizes in well under a second.
    * Higher-order functions are CodegenFallback (interpreted per row) —
    * irrelevant here: header decode is tens of byte reads per asset, and
    * the binary payloads dominate I/O at any scale.
    *
    * A null `bound` still evaluates `body` (on a null element), which is
    * exactly the pre-existing null-propagation contract of the inlined
    * subtrees.
    */
  private def letL(bound: Column)(body: Column => Column): Column =
    element_at(transform(array(bound), body), 1)

  private def boxOffset(content: Column, start: Column, endIncl: Column,
      fourccHex: String): Column = {
    val nullOff = lit(null).cast(LongType)
    val scan = aggregate(
      sequence(lit(1), lit(MaxBoxes)),
      struct(start.cast(LongType).as("off"), nullOff.as("hit")),
      (acc, _) => {
        val off = acc.getField("off")
        val hit = acc.getField("hit")
        val size = beU32At(content, off)
        val sane = off.isNotNull && off + lit(7L) <= endIncl &&
          size >= 8L && off + size - lit(1L) <= endIncl
        val isHit = sane && hex(content.substr(off + lit(4L), lit(4))) === lit(fourccHex)
        when(hit.isNotNull, acc).otherwise(struct(
          when(isHit || !sane, nullOff).otherwise(off + size).as("off"),
          when(isHit, off).otherwise(nullOff).as("hit")))
      })
    scan.getField("hit")
  }

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
    *     past the marker;
    *   - MP3: the first MPEG audio frame header (after an ID3v2 tag if
    *     one leads, skipped via its syncsafe size) — sample rate from the
    *     version bits × rate-index table, bitrate from the full
    *     version × layer × bitrate-index table (kbps; free-format index 0
    *     → null, no duration: one header cannot distinguish CBR from
    *     VBR). A reserved version/layer/index pattern falls to the stub;
    *   - MP4 (ISO BMFF): "ftyp" leading box (major brand = the 4CC right
    *     after the box name), then nested bounded box walks moov → trak
    *     → tkhd ([[boxOffset]]) — track width/height are 16.16
    *     fixed-point u32s at the tkhd tail (v0 and v1 layouts both
    *     handled) — plus moov → mvhd for timescale/duration
    *     (duration_ms = duration·1000/timescale, v0 u32 and v1 u64
    *     layouts). Audio-only tracks (zero dims) fall to the stub;
    *   - GIF: "GIF87a"/"GIF89a" signature, logical-screen dims as LE u16
    *     (frame count stays null — it needs a full data-stream walk);
    *   - BMP: "BM" signature, INFOHEADER signed LE s32 dims (top-down
    *     negative height → abs) or COREHEADER LE u16 dims.
    *
    * Remaining stub surface: payload decode only (pixels/samples need
    * codecs this container doesn't have); every metadata field the six
    * container formats carry is now a real parse. The DETERMINISTIC STUB
    * (hash-derived pseudo-metadata) still backs unknown/corrupt bytes: a
    * wrong-but-deterministic value beats a silent ???. A real deployment
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
    // JPEG: one [[letL]] binding for the SOF walk, so the dispatch below
    // can test ok + read w/h without re-embedding the segment-chain fold
    val jpeg = letL(jpegSofOffset(content)) { sofO =>
      struct(sofO.isNotNull.as("ok"),
        beU16At(content, sofO + lit(7L)).as("w"),
        beU16At(content, sofO + lit(5L)).as("h"))
    }
    // MP3: optional ID3v2 prefix ("ID3" + syncsafe u28 size at bytes
    // 7-10), then the 4-byte frame header: FF Ex sync, version bits 4-3
    // of byte 2, sample-rate index bits 3-2 of byte 3. The frame offset
    // and the three header bytes are let-bound; everything downstream
    // (rate table, bitrate table, validity) reads the bound bytes.
    val hasId3 = octet_length(content) >= 14 && magicIs(content, 1, "494433")
    val id3Size = Seq(21, 14, 7, 0).zipWithIndex.map { case (sh, i) =>
      u8At(content, lit((7 + i).toLong)).cast(LongType) * lit(1L << sh)
    }.reduce(_ + _)
    val mp3 = letL(when(hasId3, lit(11L) + id3Size).otherwise(lit(1L))) { mpOff =>
      letL(struct(
        u8At(content, mpOff).as("b1"),
        u8At(content, mpOff + lit(1L)).as("b2"),
        u8At(content, mpOff + lit(2L)).as("b3"),
        (mpOff + lit(3L) <= octet_length(content)).as("inb"))) { hb =>
        val mb1 = hb.getField("b1")
        val mb2 = hb.getField("b2")
        val mb3 = hb.getField("b3")
        val mpVer = shiftright(mb2, 3).bitwiseAND(lit(3))   // 3=MPEG1 2=MPEG2 0=MPEG2.5
        val mpLayer = shiftright(mb2, 1).bitwiseAND(lit(3)) // 0 = reserved
        val srIdx = shiftright(mb3, 2).bitwiseAND(lit(3))   // 3 = reserved
        val ok = octet_length(content) >= 4 && hb.getField("inb") &&
          mb1 === 0xFF && mb2.bitwiseAND(lit(0xE0)) === 0xE0 &&
          mpVer =!= 1 && mpLayer =!= 0 && srIdx =!= 3
        val rate =
          when(mpVer === 3, when(srIdx === 0, 44100).when(srIdx === 1, 48000).otherwise(32000))
            .when(mpVer === 2, when(srIdx === 0, 22050).when(srIdx === 1, 24000).otherwise(16000))
            .otherwise(when(srIdx === 0, 11025).when(srIdx === 1, 12000).otherwise(8000))
        // bitrate: bits 7-4 of byte 3 index the version × layer kbps table
        // (element_at is 1-based, matching index 1 = the table's first
        // column); index 0 (free format) and 15 (reserved) → null, not
        // stub — the frame is still a valid MPEG frame with a known rate
        val brIdx = shiftright(mb3, 4).bitwiseAND(lit(15))
        def kbps(vs: Int*): Column = element_at(array(vs.map(lit): _*), brIdx)
        val kb = when(brIdx >= 1 && brIdx <= 14,
          when(mpVer === 3, // MPEG1: layer bits 3=L1 2=L2 1=L3
            when(mpLayer === 3, kbps(32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448))
              .when(mpLayer === 2, kbps(32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384))
              .otherwise(kbps(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)))
            .otherwise( // MPEG2/2.5: L1, and a shared L2/L3 table
              when(mpLayer === 3, kbps(32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256))
                .otherwise(kbps(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))))
          .otherwise(lit(null).cast(IntegerType))
        struct(ok.as("ok"), rate.cast(IntegerType).as("rate"),
          kb.cast(IntegerType).as("kbps"))
      }
    }
    // WAV duration: canonical layout only (already guarded by the byte-13
    // "fmt " check) — byte rate LE u32 at 29, "data" chunk size at 41
    val wavByteRate = leU32(content, 29)
    val wavHasData = octet_length(content) >= 44 && magicIs(content, 37, "64617461")
    val wavDurMs = when(wavHasData && wavByteRate > 0,
      leU32(content, 41) * lit(1000L) / wavByteRate).cast(LongType)
    // MP4: nested box walks; tkhd v0 puts the 16.16 width/height 76/80
    // bytes into the payload, v1's 64-bit times push them 12 further
    // GIF: "GIF87a"/"GIF89a", logical-screen width/height as LE u16 at
    // bytes 7/9. Frame COUNT would need a full data-stream walk (0x2C
    // separators also occur inside pixel data), so n_frames stays null.
    val isGif = octet_length(content) >= 13 && magicIs(content, 1, "474946") &&
      (magicIs(content, 4, "383761") || magicIs(content, 4, "383961"))
    // BMP: "BM", DIB header size at byte 15 selects the layout —
    // BITMAPINFOHEADER+ (>= 40) carries signed LE s32 dims at 19/23
    // (negative height = top-down scan order → abs), the ancient
    // BITMAPCOREHEADER (= 12) unsigned LE u16 dims at 19/21.
    val isBmp = octet_length(content) >= 26 && magicIs(content, 1, "424D")
    val dibSize = leU32(content, 15)
    def leS32(off: Int): Column = {
      val raw = leU32(content, off)
      when(raw >= lit(1L << 31), raw - lit(1L << 32)).otherwise(raw)
    }
    val bmpW = when(dibSize >= 40, leS32(19)).when(dibSize === 12, leU16(content, 19))
    val bmpH = abs(when(dibSize >= 40, leS32(23)).when(dibSize === 12, leU16(content, 21)))
    val isMp4 = octet_length(content) >= 16 && magicIs(content, 5, "66747970") // "ftyp"
    // MP4: the nested box walks (moov → trak → tkhd, moov → mvhd) are the
    // worst offenders for subtree duplication — each level reads the level
    // below 2-3 times, so inlining multiplied the moov fold ~3× PER LEVEL.
    // A let-chain binds each found offset exactly once.
    val mp4 = letL(boxOffset(content, lit(1L),
        octet_length(content).cast(LongType), "6D6F6F76")) { moovO =>
      letL(moovO + beU32At(content, moovO) - lit(1L)) { moovEnd =>
        letL(boxOffset(content, moovO + lit(8L), moovEnd, "7472616B")) { trakO =>
          letL(boxOffset(content, trakO + lit(8L),
              trakO + beU32At(content, trakO) - lit(1L), "746B6864")) { tkhdO =>
            letL(when(u8At(content, tkhdO + lit(8L)) === 1, tkhdO + lit(96L))
                .otherwise(tkhdO + lit(84L))) { dimO =>
              // mvhd: moov-sibling walk; v0 = [ver/flags 4][ctime 4]
              // [mtime 4][timescale u32][duration u32], v1 widens the
              // times to u64
              letL(boxOffset(content, moovO + lit(8L), moovEnd, "6D766864")) { mvhdO =>
                val v1 = u8At(content, mvhdO + lit(8L)) === 1
                val ts = when(v1, beU32At(content, mvhdO + lit(28L)))
                  .otherwise(beU32At(content, mvhdO + lit(20L)))
                val dur = when(v1,
                    beU32At(content, mvhdO + lit(32L)) * lit(1L << 32) +
                      beU32At(content, mvhdO + lit(36L)))
                  .otherwise(beU32At(content, mvhdO + lit(24L)))
                struct(tkhdO.isNotNull.as("ok"),
                  shiftright(beU32At(content, dimO), 16).cast(IntegerType).as("w"),
                  shiftright(beU32At(content, dimO + lit(4L)), 16).cast(IntegerType).as("h"),
                  when(mvhdO.isNotNull && ts > 0, dur * lit(1000L) / ts)
                    .cast(LongType).as("dur_ms"))
              }
            }
          }
        }
      }
    }
    // ftyp major brand: the 4CC right after the box name (bytes 9-12)
    val mp4Brand = substring(content, 9, 4).cast(StringType)
    val nullLong = lit(null).cast(LongType)
    val nullStr = lit(null).cast(StringType)
    def meta(width: Column, height: Column, nFrames: Column, sampleRate: Column,
        bitrateKbps: Column = nullInt, durationMs: Column = nullLong,
        brand: Column = nullStr): Column =
      struct(width.as("width"), height.as("height"), nFrames.as("n_frames"),
        sampleRate.as("sample_rate"), bitrateKbps.as("bitrate_kbps"),
        durationMs.as("duration_ms"), brand.as("brand"))
    // Final binding: the three walk-based format structs enter the
    // dispatch as ONE bound tuple, so each parse tree occurs exactly once
    // in the whole expression no matter how many dispatch branches (or
    // struct fields, after SimplifyExtractValueOps) reference it.
    letL(struct(jpeg.as("jpeg"), mp3.as("mp3"), mp4.as("mp4"))) { fm =>
      val jp = fm.getField("jpeg")
      val m3 = fm.getField("mp3")
      val m4 = fm.getField("mp4")
      when(isPng, meta(
          beU32(content, 17).cast(IntegerType),
          beU32(content, 21).cast(IntegerType),
          lit(1).cast(IntegerType),
          nullInt))
        .when(isWav, meta(
          nullInt, nullInt, nullInt,
          leU32(content, 25).cast(IntegerType),
          durationMs = wavDurMs))
        .when(isJpeg && jp.getField("ok"), meta(
          jp.getField("w"),
          jp.getField("h"),
          lit(1).cast(IntegerType),
          nullInt))
        .when(m3.getField("ok"), meta(
          nullInt, nullInt, nullInt,
          m3.getField("rate"),
          bitrateKbps = m3.getField("kbps")))
        .when(isGif, meta(
          leU16(content, 7).cast(IntegerType),
          leU16(content, 9).cast(IntegerType),
          nullInt, nullInt))
        .when(isBmp && bmpW > 0 && bmpH > 0, meta(
          bmpW.cast(IntegerType),
          bmpH.cast(IntegerType),
          lit(1).cast(IntegerType),
          nullInt))
        .when(isMp4 && m4.getField("ok") && m4.getField("w") > 0 && m4.getField("h") > 0, meta(
          m4.getField("w"), m4.getField("h"), nullInt, nullInt,
          durationMs = m4.getField("dur_ms"), brand = mp4Brand))
        .otherwise(meta(
          (h % 1920 + 1).cast(IntegerType),
          (h % 1080 + 1).cast(IntegerType),
          (h % 240 + 1).cast(IntegerType),
          lit(16000).cast(IntegerType)))
    }
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
        when(ext.isin("jpg", "jpeg", "png", "gif", "bmp"), "image")
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
