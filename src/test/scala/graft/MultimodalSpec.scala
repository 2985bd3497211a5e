package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload round-trip, stub-decode
  * determinism, frame sampling bounds, and batch-shaped feature
  * extraction correctness.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = T.documents(spark, sf001)
  private lazy val meta = Multimodal.decodeMeta(Multimodal.withPayload(docs)).cache()

  test("payload is binary and byte length matches the source text") {
    val r = meta.select(col("n_bytes"), length(col("payload")).as("pl"),
                        length(col("payload")).cast("long").as("expected")).limit(20).collect()
    r.foreach(row => assert(row.getInt(0) == row.getInt(1)))
    val schema = Multimodal.withPayload(docs).schema("payload").dataType.typeName
    assert(schema == "binary")
  }

  test("stub decode is deterministic and in range") {
    val rows = meta.select("width", "height", "n_frames").collect()
    rows.foreach { r =>
      assert(r.getInt(0) >= 16 && r.getInt(0) < 656)
      assert(r.getInt(1) >= 16 && r.getInt(1) < 496)
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 30)
    }
    val again = Multimodal.decodeMeta(Multimodal.withPayload(docs))
      .select("width", "height", "n_frames").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("frame sampling emits at most ~maxFrames strided indices within range") {
    val s = Multimodal.sampleFrames(meta, maxFrames = 8)
      .groupBy("doc_id").agg(count(lit(1)).as("k"), max("frame_idx").as("mx"),
                             first("n_frames").as("nf")).collect()
    s.foreach { r =>
      assert(r.getLong(1) <= 8)
      assert(r.getInt(2) < r.getInt(3))
    }
  }

  test("a NULL payload yields NULL metadata instead of a decoder crash") {
    import spark.implicits._
    val rows = Multimodal.decodeMeta(
      Seq((1L, Some(Array[Byte](1, 2, 3))), (2L, Option.empty[Array[Byte]]))
        .toDF("doc_id", "payload"))
      .select("doc_id", "n_bytes", "width", "height", "n_frames")
      .collect().sortBy(_.getLong(0))
    assert(!rows(0).isNullAt(2) && rows(0).getInt(1) === 3)
    (1 to 4).foreach(i => assert(rows(1).isNullAt(i), s"col $i not null for null payload"))
  }

  test("an alternate decoder flows through the identical plan and schema") {
    // A fake "header parser": reads the first payload byte as width,
    // second as height, and a fixed frame count — structurally what a
    // real codec swap looks like (one argument at the call site).
    object HeaderDecoder extends Multimodal.MediaDecoder {
      def decode(p: Array[Byte]): Multimodal.MediaMeta =
        Multimodal.MediaMeta(p(0) & 0xFF, p(1) & 0xFF, 5)
    }
    val alt = Multimodal.decodeMeta(Multimodal.withPayload(docs), HeaderDecoder)
    // Same schema, same (shuffle-free projection) plan shape...
    assert(alt.schema == meta.schema)
    assert(alt.queryExecution.executedPlan.toString.linesIterator
      .count(_.contains("Exchange")) == 0)
    // ...different decode results, per the implementation.
    val r = alt.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .select("width", "height", "n_frames", "text").limit(10).collect()
    r.foreach { row =>
      val bytes = row.getString(3).getBytes("UTF-8")
      assert(row.getInt(0) == (bytes(0) & 0xFF))
      assert(row.getInt(1) == (bytes(1) & 0xFF))
      assert(row.getInt(2) == 5)
    }
    // Downstream stages are decoder-agnostic: frame sampling runs
    // unchanged on the alternate decoder's output.
    assert(Multimodal.sampleFrames(alt).count() > 0)
  }

  test("REAL image decode: ImageIoDecoder reads actual PNG/JPEG/GIF dimensions through the same plan") {
    import spark.implicits._
    System.setProperty("java.awt.headless", "true")
    // Real encoded images, produced in memory by the same JDK codecs
    // the decoder parses — no fixture files, no external library.
    def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(w / 2, h / 2, 0x336699)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK lacks $fmt writer")
      out.toByteArray
    }
    val payloads = Seq(
      (1L, encoded("png", 640, 480), "image/png"),
      (2L, encoded("jpg", 97, 31), "image/jpeg"),
      (3L, encoded("gif", 16, 16), "image/gif"),
      (4L, encoded("bmp", 8, 250), "image/bmp"))
    val df = payloads.toDF("doc_id", "payload", "media_type")
    val out = Multimodal.decodeMeta(df, Multimodal.ImageIoDecoder)
      .select("doc_id", "width", "height", "n_frames")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((640, 480, 1)))
    assert(out(2L) == ((97, 31, 1)))
    assert(out(3L) == ((16, 16, 1)))
    assert(out(4L) == ((8, 250, 1)))
    // Identical plumbing to the stub path: same schema, still a
    // shuffle-free projection.
    val viaStub = Multimodal.decodeMeta(df)
    assert(Multimodal.decodeMeta(df, Multimodal.ImageIoDecoder).schema == viaStub.schema)
  }

  test("REAL image decode: corrupt payloads quarantine as NULL metadata under decodeMetaLenient") {
    import spark.implicits._
    System.setProperty("java.awt.headless", "true")
    val img = new java.awt.image.BufferedImage(
      5, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val ok = { val o = new java.io.ByteArrayOutputStream()
               javax.imageio.ImageIO.write(img, "png", o); o.toByteArray }
    val corrupt = "this is not an image".getBytes("UTF-8")
    val truncated = ok.take(9) // magic survives, header does not
    val df = Seq((1L, ok), (2L, corrupt), (3L, truncated))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeMetaLenient(df, Multimodal.ImageIoDecoder)
      .select("doc_id", "width", "height").collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L), "valid image must decode")
    assert(out(2L), "non-image bytes must quarantine to NULL, not fail the stage")
    assert(out(3L), "truncated header must quarantine to NULL, not fail the stage")
    // the strict path DOES fail on the same input — the contract
    // difference is the point
    intercept[org.apache.spark.SparkException] {
      Multimodal.decodeMeta(df, Multimodal.ImageIoDecoder).collect()
    }
  }

  test("REAL audio decode: JdkAudioDecoder reads actual WAV/AU headers; non-audio quarantines") {
    import spark.implicits._
    System.setProperty("java.awt.headless", "true")
    def encodedAudio(tpe: javax.sound.sampled.AudioFileFormat.Type,
                     rate: Float, ch: Int, frames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, ch, true, tpe ne
        javax.sound.sampled.AudioFileFormat.Type.WAVE) // AU is big-endian
      val pcm = new Array[Byte](frames * ch * 2)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais, tpe, out)
      out.toByteArray
    }
    val W = javax.sound.sampled.AudioFileFormat.Type.WAVE
    val U = javax.sound.sampled.AudioFileFormat.Type.AU
    val df = Seq(
      (1L, encodedAudio(W, 22050f, 2, 4410)),
      (2L, encodedAudio(U, 8000f, 1, 16000)),
      (3L, "definitely not audio".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val out = Multimodal.decodeAudioMeta(df)
      .select("doc_id", "sample_rate", "channels", "n_frames").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getLong(3))))).toMap
    assert(out(1L).contains((22050, 2, 4410L)))
    assert(out(2L).contains((8000, 1, 16000L)))
    assert(out(3L).isEmpty, "non-audio bytes must quarantine to NULL metadata")
  }

  test("REAL video container parse: MP4 box walk yields dimensions + duration, no codec") {
    import spark.implicits._
    // Hand-assembled ISO-BMFF per the box grammar: size(u32) type(4cc)
    // payload, nested. Exercises v0 and v1 full boxes, a 64-bit
    // largesize moov, and an audio (0x0) track that must be skipped.
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
            ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
    def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xFFFFFFFFL)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
    def largeBox(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(1L) ++ typ.getBytes("ISO-8859-1") ++ be64(payload.length + 16L) ++ payload
    def fixed1616(v: Int): Array[Byte] = be32(v.toLong << 16)
    def mvhdV0(timescale: Long, duration: Long): Array[Byte] =
      box("mvhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(duration))
    def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
      box("mvhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(timescale) ++ be64(duration))
    def tkhdV0(w: Int, h: Int): Array[Byte] =
      box("tkhd", be32(0) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++ be32(0) ++
        be64(0) ++ Array.fill[Byte](2 + 2 + 2 + 2 + 36)(0) ++ fixed1616(w) ++ fixed1616(h))
    def tkhdV1(w: Int, h: Int): Array[Byte] =
      box("tkhd", Array[Byte](1, 0, 0, 0) ++ be64(0) ++ be64(0) ++ be32(1) ++ be32(0) ++
        be64(0) ++ be64(0) ++ Array.fill[Byte](2 + 2 + 2 + 2 + 36)(0) ++
        fixed1616(w) ++ fixed1616(h))
    val ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isomiso2".getBytes)
    val mp4v0 = ftyp ++ box("moov",
      mvhdV0(1000, 5000) ++
        box("trak", tkhdV0(0, 0)) ++      // audio track: 0x0, must skip
        box("trak", tkhdV0(640, 360)))
    val mp4v1 = ftyp ++ largeBox("moov",
      mvhdV1(90000, 90000L * 7) ++ box("trak", tkhdV1(1920, 1080)))
    val junk = "not remotely an mp4 container".getBytes("UTF-8")
    val truncated = mp4v0.take(40)
    val df = Seq((1L, mp4v0), (2L, mp4v1), (3L, junk), (4L, truncated))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeVideoMeta(df)
      .select("doc_id", "width", "height", "duration_ms").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getLong(3))))).toMap
    assert(out(1L).contains((640, 360, 5000L)), "v0 boxes, audio track skipped")
    assert(out(2L).contains((1920, 1080, 7000L)), "v1 full boxes under a largesize moov")
    assert(out(3L).isEmpty, "non-container bytes must quarantine")
    assert(out(4L).isEmpty, "truncated container must quarantine")
  }

  test("feature extraction yields NULL features for a NULL payload") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(spark,
      Seq((1L, Some(Array[Byte](0, 64, -128))), (2L, Option.empty[Array[Byte]]))
        .toDF("doc_id", "payload"))
      .collect().sortBy(_.getLong(0))
    assert(!feats(0).isNullAt(1))
    assert(feats(1).isNullAt(1), "missing blob must yield NULL features, not crash")
  }

  test("binaryFile source: a directory of media files feeds the identical pipeline") {
    // The real-world entry point for a media corpus is a directory of
    // encoded files, not a parquet column. Spark's built-in binaryFile
    // source reads (path, modificationTime, length, content) — map
    // content→payload and the whole decode/feature pipeline runs
    // unchanged on it.
    val dir = java.nio.file.Files.createTempDirectory("media").toFile
    val payloads = Map("a.bin" -> "first fake media blob",
                       "b.bin" -> "second blob with different bytes xyz")
    payloads.foreach { case (name, s) =>
      java.nio.file.Files.write(new java.io.File(dir, name).toPath, s.getBytes("UTF-8"))
    }
    val files = spark.read.format("binaryFile").load(dir.getAbsolutePath)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("content").as("payload"),
        col("length"))
    val out = Multimodal.decodeMeta(files.withColumn("doc_id", monotonically_increasing_id()))
    val rows = out.select("file_name", "n_bytes", "width", "height", "n_frames")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == payloads.keySet)
    payloads.foreach { case (name, s) =>
      val n = s.getBytes("UTF-8").length
      val expect = Multimodal.StubMediaDecoder.decode(s.getBytes("UTF-8"))
      assert(rows(name).getInt(1) == n, "n_bytes must equal the file length")
      assert(rows(name).getInt(2) == expect.width && rows(name).getInt(3) == expect.height,
        s"$name: binaryFile-fed decode differs from the column-fed decode")
    }
    // the length column the source reports agrees with the payload
    files.collect().foreach(r => assert(r.getAs[Long]("length") ==
      r.getAs[Array[Byte]]("payload").length.toLong))
  }

  test("mapPartitions feature extraction: histogram sums to payload length") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs))
    val joined = feats.join(meta.select("doc_id", "n_bytes"), "doc_id")
      .select(col("doc_id"), expr("aggregate(hist, 0L, (a, x) -> a + x)").as("total"),
              col("n_bytes").cast("long").as("nb"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) == r.getLong(2)))
  }

  test("cross-modal audit: caption conflicts, benign dups, stock-caption reuse, singleton exclusion (q145)") {
    import spark.implicits._
    val img = Array[Byte](1, 2, 3)
    val img2 = Array[Byte](9, 9)
    val pairs = Seq(
      // same image, two DIFFERENT captions → image_dup, n_alt=2 (conflict)
      (1L, img, "a cat"),
      (2L, img, "a dog"),
      // same image, same caption twice → image_dup, n_alt=1 (benign);
      // this caption also reuses across a distinct image below
      (3L, img2, "stock alt text"),
      (4L, img2, "stock alt text"),
      // stock caption on a different image → caption_reuse n_alt=2
      (5L, Array[Byte](7), "stock alt text"),
      // singletons: contribute to no audit row
      (6L, Array[Byte](8), "unique caption")
    ).toDF("pair_id", "payload", "caption")
    val out = Multimodal.crossModalAudit(pairs).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.count(_._1 == "image_dup") == 2)
    assert(out.contains(("image_dup", 2L, 2L)), "caption conflict must surface n_alt=2")
    assert(out.contains(("image_dup", 2L, 1L)), "benign exact re-upload is n_alt=1")
    assert(out.filter(_._1 == "caption_reuse") sameElements
      Array(("caption_reuse", 3L, 2L)),
      "one stock caption across 2 distinct images, 3 pairs; unique captions excluded")
  }

  test("REAL image resize: pixels rescale to the target, output re-decodes, corrupt quarantines") {
    import spark.implicits._
    System.setProperty("java.awt.headless", "true")
    def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      // left half red, right half blue — survives a bilinear downscale
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, if (x < w / 2) 0xFF0000 else 0x0000FF)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK lacks $fmt writer")
      out.toByteArray
    }
    val df = Seq(
      (1L, encoded("png", 64, 48)),
      (2L, encoded("jpg", 100, 80)),
      (3L, "not an image".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.resizeImages(df, 32, 32).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = out(id)
      assert(r.getBoolean(1), s"doc $id must resize")
      assert(r.getInt(3) === 32 && r.getInt(4) === 32)
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](6)))
      assert(back.getWidth === 32 && back.getHeight === 32,
        "the emitted payload must itself be a decodable 32x32 image")
      // content survives: left edge redder than blue, right edge bluer
      val l = back.getRGB(2, 16); val rr = back.getRGB(29, 16)
      assert(((l >> 16) & 0xFF) > ((l) & 0xFF), "left side keeps red dominance")
      assert((rr & 0xFF) > ((rr >> 16) & 0xFF), "right side keeps blue dominance")
    }
    val bad = out(3L)
    assert(!bad.getBoolean(1) && bad.isNullAt(6),
      "undecodable payloads quarantine as ok=false with NULL output")
  }
}
