package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Invariants for the dedup/similarity/text/multimodal extensions at
  * sf0.001 (exact equivalence is pinned by the DuckDB oracle gate).
  */
class ExtensionsSpec extends SparkSuite {

  private val dir = sf("sf0.001")

  test("minhash/ngram jaccard values are valid ratios, descending") {
    Seq("q_dedup_minhash", "q_ngram_jaccard").foreach { name =>
      val rows = SparkEntry.queries(name)(spark, dir)
        .select("jaccard").as[Double](org.apache.spark.sql.Encoders.scalaDouble).collect()
      assert(rows.nonEmpty, name)
      assert(rows.forall(j => j >= 0.0 && j <= 1.0), name)
      assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)), name)
    }
  }

  test("ngram jaccard: zero-overlap and single-word (empty-gram) pairs are skipped, never NaN") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "one", "blk"),                  // single word → empty bigram set
      (2L, "two", "blk"),                  // ditto: pair (1,2) must not be 0/0=NaN
      (3L, "a b c", "blk"),
      (4L, "x y z", "blk"),                // no gram shared with 3 → skipped
      (5L, "a b q", "blk"),                // shares "a b" with 3
    ).toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet == Set((3L, 5L, 1.0 / 3.0)))
    assert(got.forall(t => !t._3.isNaN && t._3 > 0.0))
  }

  test("near-dup clusters: transitive closure, min-id canonical, singletons kept") {
    val s = spark
    import s.implicits._
    // a chain 5–2–7 (no direct 5–7 pair) must close transitively to
    // canonical 2; 9 has no pair and stays a singleton
    val ids = Seq(2L, 5L, 7L, 9L).toDF("doc_id")
    val pairs = Seq((5L, 2L), (2L, 7L)).toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.clusterPairs(ids, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((2L, 2L, 3L), (5L, 2L, 3L), (7L, 2L, 3L), (9L, 9L, 1L)))
  }

  test("simhash hamming pairs are within threshold and well-formed") {
    val df = SparkEntry.queries("q_dedup_simhash")(spark, dir)
    assert(df.filter(col("hamming") > 3 || col("hamming") < 0).count() == 0)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() == 0)
  }

  test("cosine top-k: bounded, k<=3 per query, bucketed is a subset universe") {
    val brute = SparkEntry.queries("q_similarity_cosine")(spark, dir)
    assert(brute.filter(col("cos") > 1.000001 || col("cos") < -1.000001).count() == 0)
    val perQuery = brute.groupBy("query_id").count()
    assert(perQuery.filter(col("count") > 3).count() == 0)
    // bucketed rank-1 cosine can never beat brute-force rank-1
    val b1 = SparkEntry.queries("q_similarity_bucketed")(spark, dir)
      .filter(col("rank") === 1).select(col("query_id"), col("cos").as("bcos"))
    val f1 = brute.filter(col("rank") === 1).select(col("query_id"), col("cos").as("fcos"))
    assert(b1.join(f1, "query_id").filter(col("bcos") > col("fcos") + lit(1e-9)).count() == 0)
  }

  test("approximate distinct (HLL): within 5% of exact, mergeable across partitions") {
    val li = Tables(spark, sf("sf0.01"), "lineitem")
    val exact = li.select("l_partkey").distinct().count().toDouble
    // repartition forces partial-sketch merges across 16 partitions
    val approx = li.repartition(16)
      .agg(approx_count_distinct(col("l_partkey")).as("n"))
      .head().getLong(0).toDouble
    assert(math.abs(approx - exact) / exact < 0.05, s"approx $approx vs exact $exact")
  }

  test("exact dedup: canonical ids are minimal and self-consistent") {
    val df = SparkEntry.queries("q_dedup_exact")(spark, dir)
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
    assert(df.filter(col("is_dup") && col("canonical_id") === col("doc_id")).count() == 0)
  }

  test("multimodal: binaryFile media-lake ingest with glob and type mapping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media")
    java.nio.file.Files.write(dir.resolve("a.jpg"), Array.fill[Byte](100)(7))
    java.nio.file.Files.write(dir.resolve("b.mp4"), Array.fill[Byte](500)(9))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "hi".getBytes)
    val all = Multimodal.readMediaDir(spark, dir.toString)
    assert(all.count() == 3)
    val byType = all.groupBy("media_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType == Map("image" -> 1L, "video" -> 1L, "binary" -> 1L))
    assert(all.filter(col("media_type") === "video")
      .select("byte_length").head().getLong(0) == 500L)
    // glob pushdown: only images listed
    val imgs = Multimodal.readMediaDir(spark, dir.toString, Some("*.jpg"))
    assert(imgs.count() == 1)
    // the ingest feeds the existing meta/frame pipeline unchanged
    assert(Multimodal.withMeta(imgs).select("meta.width").head().getInt(0) >= 1)
  }

  test("multimodal: decodeMeta parses REAL PNG and WAV bytes (header parse, no media lib)") {
    val s = spark
    import s.implicits._
    // a real PNG from the JDK's own encoder — nothing hand-forged
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(2, 1, 0xff8800)
    val pngOut = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", pngOut))
    val png = pngOut.toByteArray
    // a real WAV from the JDK's own audio writer: 4410 frames (200 ms) of
    // 16-bit mono PCM at 22050 Hz
    val fmt = new javax.sound.sampled.AudioFormat(22050f, 16, 1, true, false)
    val pcm = Array.fill[Byte](8820)(3)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 4410)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)
    val wav = wavOut.toByteArray
    val assets = Seq(
      (1L, "image", png), (2L, "audio", wav),
      (3L, "binary", "not media at all".getBytes("UTF-8")),
    ).toDF("asset_id", "media_type", "content")
    val meta = Multimodal.withMeta(assets)
      .select("asset_id", "meta.width", "meta.height", "meta.n_frames", "meta.sample_rate")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    // PNG: true dimensions from IHDR, single frame, no audio rate
    assert(meta(1L) == ((Some(5), Some(3), Some(1), None)), meta(1L).toString)
    // WAV: true sample rate from the fmt chunk, no raster dims
    assert(meta(2L) == ((None, None, None, Some(22050))), meta(2L).toString)
    // WAV duration from data-chunk size / byte rate: 8820 B at 44100 B/s = 200 ms
    val wavDur = Multimodal.withMeta(assets).filter(col("asset_id") === 2L)
      .select("meta.duration_ms").head()
    assert(wavDur.getLong(0) == 200L, wavDur.toString)
    // unknown bytes: deterministic stub values, never null
    val (w3, h3, f3, r3) = meta(3L)
    assert(Seq(w3, h3, f3, r3).forall(_.isDefined))
    assert(r3.contains(16000))
  }

  test("multimodal: decodeMeta parses REAL JPEG bytes via the SOF segment walk") {
    val s = spark
    import s.implicits._
    // a real baseline JPEG from the JDK's own encoder: APP0 + quant +
    // huffman segments precede SOF0, so the walk must actually walk
    val img = new java.awt.image.BufferedImage(37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(10, 10, 0x3366cc)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val jpg = out.toByteArray
    assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8) // sanity: SOI
    // hand-forged PROGRESSIVE jpeg: SOI, APP0 (2-byte body), SOF2 with
    // height 513 / width 1027 — covers the 0xFFC2 branch and >255 dims
    def be16(v: Int) = Seq((v >> 8).toByte, (v & 0xff).toByte)
    val sof2 = (Seq(0xff, 0xd8).map(_.toByte) ++
      Seq(0xff, 0xe0).map(_.toByte) ++ be16(4) ++ Seq(0x4a, 0x46).map(_.toByte) ++
      Seq(0xff, 0xc2).map(_.toByte) ++ be16(11) ++ Seq(8.toByte) ++
      be16(513) ++ be16(1027) ++ Seq(1, 0x11, 0).map(_.toByte)).toArray
    // truncated garbage with a JPEG signature: the walk must give up
    // (null SOF) and fall to the stub, not throw or decode junk
    val trunc = Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)
    // non-canonical WAV (LIST chunk where fmt belongs): stub, not a
    // garbage byte-25 sample-rate read
    val badWav = ("RIFF".getBytes ++ Array.fill[Byte](4)(0x10) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ Array.fill[Byte](40)(0x42)).toArray
    val assets = Seq((1L, "image", jpg), (2L, "image", sof2),
      (3L, "image", trunc), (4L, "audio", badWav))
      .toDF("asset_id", "media_type", "content")
    val meta = Multimodal.withMeta(assets)
      .select("asset_id", "meta.width", "meta.height", "meta.sample_rate")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(meta(1L)._1.contains(37) && meta(1L)._2.contains(23), meta(1L).toString)
    assert(meta(2L)._1.contains(1027) && meta(2L)._2.contains(513), meta(2L).toString)
    // stub fallbacks: bounded fake dims, and the WAV one must NOT carry a
    // decoded sample rate of garbage — the stub pins 16000
    assert(meta(3L)._3.contains(16000), meta(3L).toString)
    assert(meta(4L)._3.contains(16000), meta(4L).toString)
  }

  test("multimodal: decodeMeta parses MP3 frame headers and MP4 tkhd boxes") {
    val s = spark
    import s.implicits._
    // MPEG1 Layer III 44.1 kHz frame header (FF FB 90 00) + dummy payload
    val mp3 = (Seq(0xff, 0xfb, 0x90, 0x00).map(_.toByte) ++ Array.fill[Byte](16)(0)).toArray
    // same frame behind an ID3v2 tag whose syncsafe size is 130 (0x01 0x02)
    val id3 = ("ID3".getBytes ++ Seq(3, 0, 0).map(_.toByte) ++
      Seq(0, 0, 1, 2).map(_.toByte) ++ Array.fill[Byte](130)(0x55) ++
      Seq(0xff, 0xf3, 0x64, 0x00).map(_.toByte)).toArray // MPEG2, rate idx 1 = 24 kHz
    // reserved sample-rate index (bits 3-2 of byte 3 = 11) must stub out
    val badMp3 = (Seq(0xff, 0xfb, 0x9c, 0x00).map(_.toByte) ++ Array.fill[Byte](8)(0)).toArray
    // minimal ISO BMFF: ftyp box, then moov{ mvhd-sized filler, trak{ tkhd v0 } }
    def be32(v: Long) = Seq((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(fourcc: String, payload: Seq[Byte]): Seq[Byte] =
      be32(8L + payload.length) ++ fourcc.getBytes.toSeq ++ payload
    // tkhd v0: version+flags, ctime, mtime, trackid, res, duration (24B),
    // res(8) layer(2) alt(2) vol(2) res(2), matrix(36), then 16.16 w/h
    val tkhd = box("tkhd", Seq.fill[Byte](24)(0) ++ Seq.fill[Byte](16)(0) ++
      Seq.fill[Byte](36)(0) ++ be32(640L << 16) ++ be32(360L << 16))
    // a leading non-trak sibling forces the moov walk to actually walk —
    // and doubles as a real v0 mvhd: timescale 600, duration 1200 → 2000 ms
    val mvhdFiller = box("mvhd", Seq.fill[Byte](12)(0) ++ be32(600L) ++ be32(1200L))
    val mp4 = (box("ftyp", "isom0000".getBytes.toSeq) ++
      box("moov", mvhdFiller ++ box("trak", tkhd))).toArray
    // audio-only mp4: tkhd with zero dims must fall to the stub
    val tkhd0 = box("tkhd", Seq.fill[Byte](76)(0) ++ be32(0L) ++ be32(0L))
    val m4a = (box("ftyp", "M4A 0000".getBytes.toSeq) ++
      box("moov", box("trak", tkhd0))).toArray
    val assets = Seq((1L, "audio", mp3), (2L, "audio", id3), (3L, "audio", badMp3),
      (4L, "video", mp4), (5L, "audio", m4a))
      .toDF("asset_id", "media_type", "content")
    val meta = Multimodal.withMeta(assets)
      .select("asset_id", "meta.width", "meta.height", "meta.sample_rate",
        "meta.bitrate_kbps", "meta.duration_ms", "meta.brand")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3))),
          (Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))).toMap
    assert(meta(1L)._1._3.contains(44100), meta(1L).toString)
    // V1 L3 bitrate index 9 = 128 kbps; one header can't prove CBR → no duration
    assert(meta(1L)._2 == ((Some(128), None, None)), meta(1L).toString)
    assert(meta(2L)._1._3.contains(24000), meta(2L).toString) // ID3 skipped, MPEG2 table
    assert(meta(2L)._2._1.contains(48), meta(2L).toString)    // V2 L3 index 6 = 48 kbps
    assert(meta(3L)._1._3.contains(16000), meta(3L).toString) // reserved index -> stub
    assert(meta(4L)._1._1.contains(640) && meta(4L)._1._2.contains(360), meta(4L).toString)
    // mvhd v0: duration 1200 at timescale 600 → 2000 ms; ftyp major brand rides along
    assert(meta(4L)._2 == ((None, Some(2000L), Some("isom"))), meta(4L).toString)
    assert(meta(5L)._1._3.contains(16000), meta(5L).toString) // zero-dim tkhd -> stub
  }

  test("multimodal: decodeMeta parses REAL GIF and BMP bytes") {
    val s = spark
    import s.implicits._
    // real GIF/BMP from the JDK's own encoders — nothing hand-forged
    def enc(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"no JDK $fmt writer")
      out.toByteArray
    }
    val gif = enc("gif", 41, 17)
    val bmp = enc("bmp", 29, 53)
    // hand-forged top-down BMP (negative height) must abs() the dims
    def le32(v: Long) = Seq(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val topDown = ("BM".getBytes.toSeq ++ le32(70) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(7) ++ le32((-9L) & 0xFFFFFFFFL) ++
      Seq.fill[Byte](20)(0)).toArray
    val assets = Seq((1L, "image", gif), (2L, "image", bmp), (3L, "image", topDown))
      .toDF("asset_id", "media_type", "content")
    val meta = Multimodal.withMeta(assets)
      .select("asset_id", "meta.width", "meta.height", "meta.n_frames")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(meta(1L) == ((Some(41), Some(17), None)), meta(1L).toString) // frame count null
    assert(meta(2L)._1.contains(29) && meta(2L)._2.contains(53), meta(2L).toString)
    assert(meta(3L)._1.contains(7) && meta(3L)._2.contains(9), meta(3L).toString)
  }

  test("multimodal: meta decode, resize contract, frame sampling math") {
    val s = spark
    import s.implicits._
    val assets = Seq(
      (1L, "image", ("x" * 100).getBytes("UTF-8")),
      (2L, "video", ("y" * 1000).getBytes("UTF-8")),
    ).toDF("asset_id", "media_type", "content")
    val withMeta = Multimodal.withMeta(assets)
    assert(withMeta.select("meta.width").as[Int].collect().forall(w => w >= 1 && w <= 1920))
    val resized = Multimodal.resize(withMeta, 64, 64)
    assert(resized.select("meta.width").as[Int].collect().forall(_ == 64))
    assert(resized.columns.toSeq == withMeta.columns.toSeq)
    // 1000 bytes / 100-byte frames = 10 chunks, stride 2 → frames 0,2,4,6,8
    val frames = Multimodal.sampleFrames(withMeta.filter($"asset_id" === 2), 100, 2)
    assert(frames.count() == 5)
    assert(frames.select(max(octet_length(col("frame")))).head().getInt(0) == 100)
    // partitioning helper preserves rows
    assert(Multimodal.repartitionBySize(withMeta, 4).count() == 2)
  }
}
