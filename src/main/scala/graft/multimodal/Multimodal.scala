package graft.multimodal

import graft.T
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing — north-star extension. Media (image/
  * audio/video) is carried as an opaque `binary` payload column with a
  * typed metadata struct beside it; decode / feature-extraction is a
  * per-partition batch stage.
  *
  * Decode tiers: the IMAGE modality decodes for real via the JDK's
  * `javax.imageio` ([[ImageIoDecoder]] — PNG/JPEG/GIF/BMP header
  * parse, no external library; MultimodalSpec drives it with real
  * in-memory-encoded images). Audio/video have no JDK codec (env), so
  * their decode remains a DETERMINISTIC STUB ([[StubMediaDecoder]],
  * clearly marked): fake dimensions/frame counts derived
  * arithmetically from payload bytes. The stub also remains the
  * CATALOG default because the testdata payloads are text bytes, not
  * media (TESTDATA.md forbids synthesizing new input tables). The
  * Spark-side plumbing — schema, binary handling, batch-shaped
  * mapPartitions, frame-index explosion, partition sizing — is
  * identical for every decoder: the swap is one argument
  * (MultimodalSpec pins the same-plan property).
  *
  * Scale posture: payloads ride as parquet binary chunks; metadata
  * extraction is a projection (no shuffle); feature extraction is
  * iterator-to-iterator mapPartitions (the JVM analog of mapInPandas
  * batches) so per-row overhead is amortized and memory stays bounded
  * by one partition's batch.
  */
object Multimodal {

  /** Attach a binary payload column. The documents table stands in for
    * a media corpus: text bytes ≙ encoded media bytes (the container
    * ships no images; TESTDATA.md forbids synthesizing new inputs).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("application/octet-stream").as("media_type"))

  /** Decoded media metadata: what a container/header parse yields. */
  final case class MediaMeta(width: Int, height: Int, n_frames: Int)

  /** Pluggable decode contract. A decoder sees one payload's bytes and
    * returns its metadata — inherently opaque to Catalyst (real codecs
    * are byte parsers), so it runs as a serializable function shipped
    * to executors; the surrounding plan (schema, partitioning, column
    * layout) is identical for every implementation, which is what the
    * MultimodalSpec pins. Swapping the stub for a JNI/JavaCV decoder
    * is one argument at the [[decodeMeta]] call site.
    */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  /** ---- STUB DECODE ----
    * Deterministic fake metadata derived arithmetically from payload
    * length (the testdata payloads are text bytes, not media). Int
    * arithmetic mirrors the SQL oracle exactly. This remains the
    * catalog default because q80/q81's inputs are not images; REAL
    * image decode is [[ImageIoDecoder]] below.
    */
  object StubMediaDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      // n*7 in Long: the SQL oracle's octet_length(..)*7 is BIGINT
      // arithmetic, and Int would overflow (negative height) past
      // ~306 MB payloads.
      MediaMeta(n % 640 + 16, (n.toLong * 7 % 480).toInt + 16, n % 30 + 1)
    }
  }

  /** ---- REAL IMAGE DECODE (pure JDK, headless) ----
    * Container/header parse via `javax.imageio` — PNG/JPEG/GIF/BMP
    * ship with the JDK's `java.desktop` module, so no external codec
    * library is needed for the image modality. Header-only: the
    * reader yields width/height (and GIF frame count) WITHOUT
    * decoding pixel data — exactly what a 100 TB metadata pass wants
    * (IO-bound on the payload column, no decode CPU). Unrecognized
    * containers throw; pair with [[decodeMetaLenient]] to quarantine
    * instead of failing the stage. Audio/video remain stub-only — the
    * JDK has no codecs for them (env).
    */
  object ImageIoDecoder extends MediaDecoder {
    def decode(payload: Array[Byte]): MediaMeta = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext)
          throw new IllegalArgumentException("unrecognized image container")
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          // allowSearch=true: exact frame count (GIF animations); still
          // formats report 1. Some readers refuse the search — treat
          // as a single frame rather than failing the metadata pass.
          val n = try math.max(r.getNumImages(true), 1)
                  catch { case _: Exception => 1 }
          MediaMeta(r.getWidth(0), r.getHeight(0), n)
        } finally r.dispose()
      } finally iis.close()
    }
  }

  /** Metadata extraction: n_bytes is a native expression; width/height/
    * n_frames come from the pluggable decoder (stub by default). One
    * projection, no shuffle, whatever the decoder.
    */
  def decodeMeta(withBytes: DataFrame,
                 decoder: MediaDecoder = StubMediaDecoder): DataFrame = {
    // Option-wrapped so a NULL payload (missing blob in a real media
    // table) yields NULL metadata like the native expressions would,
    // instead of an NPE inside the decoder.
    val dec = udf((p: Array[Byte]) => Option(p).map(decoder.decode))
    withBytes
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("m", dec(col("payload")))
      .withColumn("width", col("m.width"))
      .withColumn("height", col("m.height"))
      .withColumn("n_frames", col("m.n_frames"))
      .drop("m")
  }

  /** Decoded audio metadata: the container-header facts an audio
    * corpus pass indexes (duration = n_frames / sample_rate).
    */
  final case class AudioMeta(sample_rate: Int, channels: Int, n_frames: Long)

  trait AudioDecoder extends Serializable {
    def decode(payload: Array[Byte]): AudioMeta
  }

  /** ---- REAL AUDIO DECODE (pure JDK, headless) ----
    * WAV/AIFF/AU container-header parse via `javax.sound.sampled`
    * (`java.desktop` again — no external library, no audio device
    * needed). Header-only like [[ImageIoDecoder]]: sample rate,
    * channel count and frame length come back without touching the
    * PCM body. Compressed codecs (MP3/AAC/OGG) have no JDK decoder
    * (env) — those payloads throw and quarantine under the lenient
    * path.
    */
  object JdkAudioDecoder extends AudioDecoder {
    def decode(payload: Array[Byte]): AudioMeta = {
      val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      AudioMeta(ff.getFormat.getSampleRate.toInt, ff.getFormat.getChannels,
        ff.getFrameLength.toLong)
    }
  }

  /** Audio metadata extraction, quarantine semantics built in: NULL
    * payloads and undecodable containers yield NULL metadata rows.
    * Same shuffle-free projection shape as [[decodeMeta]].
    */
  def decodeAudioMeta(withBytes: DataFrame,
                      decoder: AudioDecoder = JdkAudioDecoder): DataFrame = {
    val dec = udf((p: Array[Byte]) => Option(p).flatMap { bytes =>
      try Some(decoder.decode(bytes)) catch { case _: Exception => None }
    })
    withBytes
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("m", dec(col("payload")))
      .withColumn("sample_rate", col("m.sample_rate"))
      .withColumn("channels", col("m.channels"))
      .withColumn("n_frames", col("m.n_frames"))
      .drop("m")
  }

  /** Decoded video metadata: the ISO-BMFF container facts a video
    * corpus pass indexes without any codec (duration in millis from
    * mvhd timescale; presentation dimensions from the first video
    * tkhd). Frame-accurate counts need the sample tables + codec —
    * out of scope for a header pass.
    */
  final case class VideoMeta(width: Int, height: Int, duration_ms: Long)

  trait VideoDecoder extends Serializable {
    def decode(payload: Array[Byte]): VideoMeta
  }

  /** ---- REAL VIDEO CONTAINER PARSE (pure Scala, no codec) ----
    * Minimal ISO-BMFF (MP4/MOV) box walk: `moov/mvhd` for
    * timescale+duration, `moov/trak/tkhd` for track dimensions (16.16
    * fixed point; the first track with nonzero width wins — audio
    * tracks carry 0×0). Handles 32-bit and 64-bit (`largesize`) box
    * sizes and v0/v1 full-box layouts. This is the standard
    * codec-free metadata pass (what ffprobe does for these fields);
    * PIXEL decode stays env-blocked (no JDK video codec). Malformed
    * containers throw — pair with quarantine like the other tiers.
    */
  object Mp4HeaderDecoder extends VideoDecoder {
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    private def u64(b: Array[Byte], o: Int): Long =
      (u32(b, o) << 32) | u32(b, o + 4)
    private def fourcc(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "ISO-8859-1")

    /** Walk the boxes in [from, to); call f(type, payloadFrom, payloadTo). */
    private def walk(b: Array[Byte], from: Int, to: Int)
                    (f: (String, Int, Int) => Unit): Unit = {
      var o = from
      while (o + 8 <= to) {
        val size32 = u32(b, o)
        val typ = fourcc(b, o + 4)
        val (payload, end) =
          if (size32 == 1L) { // 64-bit largesize follows the type
            if (o + 16 > to) throw new IllegalArgumentException("truncated largesize box")
            val sz = u64(b, o + 8)
            if (sz < 16 || o + sz > to) throw new IllegalArgumentException("bad largesize")
            (o + 16, o + sz.toInt)
          } else if (size32 == 0L) { // box runs to end of enclosing space
            (o + 8, to)
          } else {
            if (size32 < 8 || o + size32 > to) throw new IllegalArgumentException("bad box size")
            (o + 8, o + size32.toInt)
          }
        f(typ, payload, end)
        o = end
      }
    }

    def decode(payload: Array[Byte]): VideoMeta = {
      var sawFtyp = false
      var timescale = 0L; var duration = -1L
      var width = 0; var height = 0
      walk(payload, 0, payload.length) {
        case ("ftyp", _, _) => sawFtyp = true
        case ("moov", mFrom, mTo) =>
          walk(payload, mFrom, mTo) {
            case ("mvhd", o, _) =>
              val v = payload(o) & 0xFF
              if (v == 1) { timescale = u32(payload, o + 20); duration = u64(payload, o + 24) }
              else        { timescale = u32(payload, o + 12); duration = u32(payload, o + 16) }
            case ("trak", tFrom, tTo) =>
              walk(payload, tFrom, tTo) {
                case ("tkhd", o, _) if width == 0 =>
                  val v = payload(o) & 0xFF
                  // v0: 1+3 ver/flags, 4+4 times, 4 id, 4 res, 4 dur;
                  // v1 widens times+duration to 8 bytes. Then 8 res,
                  // 2+2+2+2 layer/group/volume/res, 36 matrix.
                  val base = o + (if (v == 1) 4 + 8 + 8 + 4 + 4 + 8 else 4 + 4 + 4 + 4 + 4 + 4)
                  val dimOff = base + 8 + 2 + 2 + 2 + 2 + 36
                  width = (u32(payload, dimOff) >> 16).toInt      // 16.16 fixed
                  height = (u32(payload, dimOff + 4) >> 16).toInt
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      if (!sawFtyp || timescale == 0L || duration < 0L || width == 0)
        throw new IllegalArgumentException(
          s"not a video ISO-BMFF container (ftyp=$sawFtyp ts=$timescale dur=$duration w=$width)")
      VideoMeta(width, height, duration * 1000 / timescale)
    }
  }

  /** Video metadata extraction with quarantine (same contract as
    * [[decodeAudioMeta]]): NULL payloads and non-ISO-BMFF containers
    * yield NULL metadata rows; one shuffle-free projection.
    */
  def decodeVideoMeta(withBytes: DataFrame,
                      decoder: VideoDecoder = Mp4HeaderDecoder): DataFrame = {
    val dec = udf((p: Array[Byte]) => Option(p).flatMap { bytes =>
      try Some(decoder.decode(bytes)) catch { case _: Exception => None }
    })
    withBytes
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("m", dec(col("payload")))
      .withColumn("width", col("m.width"))
      .withColumn("height", col("m.height"))
      .withColumn("duration_ms", col("m.duration_ms"))
      .drop("m")
  }

  /** [[decodeMeta]] with per-payload quarantine: a corrupt blob yields
    * NULL metadata (the row survives, flaggable downstream) instead of
    * failing the whole stage — the operational contract a 100 TB media
    * pass needs, where some sliver of payloads is always damaged.
    */
  def decodeMetaLenient(withBytes: DataFrame,
                        decoder: MediaDecoder): DataFrame = {
    val dec = udf((p: Array[Byte]) => Option(p).flatMap { bytes =>
      try Some(decoder.decode(bytes)) catch { case _: Exception => None }
    })
    withBytes
      .withColumn("n_bytes", length(col("payload")))
      .withColumn("m", dec(col("payload")))
      .withColumn("width", col("m.width"))
      .withColumn("height", col("m.height"))
      .withColumn("n_frames", col("m.n_frames"))
      .drop("m")
  }

  /** Frame sampling: one row per sampled frame index, stride chosen to
    * cap at ~maxFrames samples. Pure sequence+explode — a projection.
    */
  def sampleFrames(meta: DataFrame, maxFrames: Int = 8): DataFrame = {
    val stride = greatest(ceil(col("n_frames").cast("double") / maxFrames).cast("int"), lit(1))
    meta.select(
      col("doc_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, stride)).as("frame_idx"))
  }

  /** Batch-shaped feature extraction via mapPartitions: computes a
    * 4-bin byte histogram per payload (stands in for an embedding /
    * resize result). Iterator-to-iterator: one output batch per input
    * partition, no per-row closure dispatch.
    */
  def extractFeatures(spark: SparkSession, withBytes: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("hist", ArrayType(LongType, containsNull = false), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withBytes.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        if (bytes == null) Row(r.getLong(0), null) // missing blob → NULL features
        else {
          val hist = new Array[Long](4)
          var i = 0
          while (i < bytes.length) { hist(((bytes(i) & 0xFF) >> 6)) += 1; i += 1 }
          Row(r.getLong(0), hist.toIndexedSeq)
        }
      }
    }(enc)
  }

  /** Real pixel-transform stage — image RESIZE with zero external
    * deps: ImageIO decode (PNG/JPEG/GIF/BMP, same JDK surface as
    * [[ImageIoDecoder]]) → Graphics2D bilinear rescale to (targetW,
    * targetH) → PNG re-encode, as an iterator-to-iterator
    * mapPartitions stage (the standard thumbnail/normalize step
    * before a vision encoder). Undecodable or non-image payloads are
    * QUARANTINED as ok=false rows with NULL output — the
    * decodeMetaLenient contract — so one corrupt blob never kills a
    * 100 TB partition. Batch shape: one JVM-local decode loop per
    * partition, no per-row UDF dispatch, output bytes are a new
    * binary column (payloads never shuffle unless the caller asks).
    */
  def resizeImages(withBytes: DataFrame,
                   targetW: Int = 32, targetH: Int = 32): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("ok", BooleanType, nullable = false),
      StructField("in_bytes", LongType, nullable = true),
      StructField("out_w", IntegerType, nullable = true),
      StructField("out_h", IntegerType, nullable = true),
      StructField("out_bytes", LongType, nullable = true),
      StructField("payload_out", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withBytes.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        def bad = Row(r.getLong(0), false,
          if (bytes == null) null else bytes.length.toLong, null, null, null, null)
        if (bytes == null) bad
        else try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          if (img == null) bad
          else {
            val out = new java.awt.image.BufferedImage(
              targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, targetW, targetH, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            val ob = bos.toByteArray
            Row(r.getLong(0), true, bytes.length.toLong,
              targetW, targetH, ob.length.toLong, ob)
          }
        } catch { case _: Exception => bad }
      }
    }(enc)
  }

  /** Cross-modal pair audit — the LAION-style image-text-pair hygiene
    * pass: (a) `image_dup` — the same payload bytes uploaded under
    * more than one pair, with the count of DISTINCT captions attached
    * (n_alt > 1 is a caption conflict: one image, contradictory
    * supervision); (b) `caption_reuse` — one caption string attached
    * to more than one distinct payload (stock alt-text spam, the
    * dominant noise mode in crawled pairs). Keys are md5 of the modal
    * content, so the audit never shuffles payload bytes — each side is
    * ONE hash-keyed partial agg over the pairs relation, and rows with
    * nothing to report never leave the map side (HAVING-style filters
    * sit on the aggregate). At 100 TB the relation shuffled is
    * (128-bit key, counts), not media.
    *
    * `pairs` schema: (pair_id, payload binary, caption string).
    */
  def crossModalAudit(pairs: DataFrame): DataFrame = {
    val keyed = pairs.select(md5(col("payload")).as("img"), md5(col("caption")).as("cap"))
    val imgDup = keyed.groupBy(col("img"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("cap")).as("n_alt"))
      .filter(col("n_pairs") > 1)
      .select(lit("image_dup").as("kind"), col("img").as("k"),
        col("n_pairs"), col("n_alt"))
    val capReuse = keyed.groupBy(col("cap"))
      .agg(count(lit(1)).as("n_pairs"), countDistinct(col("img")).as("n_alt"))
      .filter(col("n_pairs") > 1 && col("n_alt") > 1)
      .select(lit("caption_reuse").as("kind"), col("cap").as("k"),
        col("n_pairs"), col("n_alt"))
    imgDup.unionByName(capReuse).orderBy(col("kind"), col("k"))
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Payload + stub-decoded metadata (deterministic → SQL oracle).
    "q80_multimodal_meta" -> ((s, d) =>
      decodeMeta(withPayload(T.documents(s, d)))
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"), col("n_frames"))
        .orderBy(col("doc_id"))),

    // Sampled frame indices for the first docs (deterministic stride).
    "q81_frame_sample" -> ((s, d) =>
      sampleFrames(decodeMeta(withPayload(T.documents(s, d).filter(col("doc_id") < 50))))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"))
        .orderBy(col("doc_id"), col("frame_idx"))),

    // Cross-modal pair audit over documents-as-pairs: caption = the
    // first 8 tokens (the alt-text region), payload = the remaining
    // tokens' bytes (the content region). On this corpus the planted
    // near-dups mutate the content region too, so image_dup groups are
    // structurally absent (the audit correctly reports none) and the
    // caption_reuse side is live — near-dups share their alt-text
    // region while their content bytes differ. MultimodalSpec plants
    // the image_dup + caption-conflict cases the testdata can't.
    "q145_cross_modal_audit" -> ((s, d) => {
      val ws = split(col("text"), " ")
      crossModalAudit(T.documents(s, d).select(
        col("doc_id").as("pair_id"),
        encode(array_join(slice(ws, lit(9), size(ws)), " "), "UTF-8").as("payload"),
        array_join(slice(ws, 1, 8), " ").as("caption")))
    })
  )

  val oracle: Map[String, String] = Map(
    "q80_multimodal_meta" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
        | CAST((octet_length(encode(text)) * 7) % 480 + 16 AS INT) AS height,
        | CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q81_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
        |  FROM documents WHERE doc_id < 50
        |), s AS (
        |  SELECT doc_id, n_frames,
        |         CAST(greatest(CAST(ceil(CAST(n_frames AS DOUBLE) / 8) AS INT), 1) AS INT) AS stride
        |  FROM m
        |)
        |SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, stride)) AS INT) AS frame_idx
        |FROM s ORDER BY doc_id, frame_idx""".stripMargin,

    "q145_cross_modal_audit" ->
      """WITH p AS (
        |  SELECT md5(array_to_string(list_slice(ws, 9, len(ws)), ' ')) AS img,
        |         md5(array_to_string(list_slice(ws, 1, 8), ' ')) AS cap
        |  FROM (SELECT string_split(text, ' ') AS ws FROM documents)
        |), i AS (
        |  SELECT 'image_dup' AS kind, img AS k, count(*) AS n_pairs,
        |         CAST(count(DISTINCT cap) AS BIGINT) AS n_alt
        |  FROM p GROUP BY img HAVING count(*) > 1
        |), c AS (
        |  SELECT 'caption_reuse' AS kind, cap AS k, count(*) AS n_pairs,
        |         CAST(count(DISTINCT img) AS BIGINT) AS n_alt
        |  FROM p GROUP BY cap HAVING count(*) > 1 AND count(DISTINCT img) > 1
        |)
        |SELECT * FROM (SELECT * FROM i UNION ALL SELECT * FROM c)
        |ORDER BY kind, k""".stripMargin
  )
}
