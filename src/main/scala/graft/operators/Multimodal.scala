package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media (image/audio/video) as opaque
  * `binary` columns with typed metadata, plus a batched decode /
  * feature-extract stage.
  *
  * The IMAGE, AUDIO and VIDEO paths are all real end-to-end:
  * [[withMediaPayload]] generates genuine PNG bytes
  * ([[imagePayload]]), genuine PCM WAV bytes ([[audioPayload]]) and
  * genuine MJPEG-in-AVI bytes ([[videoPayload]] — a RIFF/AVI
  * container whose frames are real JPEGs), and [[decode]] /
  * [[resizeImages]] / [[decodeAudio]] / [[decodeVideo]] /
  * [[frameSampleVideo]] run them through `javax.imageio` and
  * `javax.sound.sampled` plus a pure-JVM RIFF demuxer (AVI is plain
  * RIFF chunk walking; the per-frame JPEG decode is javax.imageio
  * again — no external codec needed for any of the three). A
  * production deployment would swap the MJPEG demuxer for ffmpeg
  * bindings to cover inter-frame codecs; everything else stays
  * identical.
  *
  * At 100 TB scale: binary payloads stay columnar in parquet, decode
  * runs per-partition (one codec context per partition, not per row),
  * and metadata-only queries never touch the binary column (column
  * pruning keeps the scan narrow).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded features (width/height/channels for images; a real
    * decoder fills these from the codec). */
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      channels: Int)

  /** Attach a binary payload column derived from text (the testdata
    * has no real media; payload bytes are the UTF-8 text, which keeps
    * the pipeline deterministic end-to-end). */
  def withBinaryPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      when(col(idCol) % 3 === 0, lit("image"))
        .when(col(idCol) % 3 === 1, lit("audio"))
        .otherwise(lit("video")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Deterministic REAL PNG for doc `id`: a (16 + id%16) × (16 + id%9)
    * RGB image with id-derived pixels, encoded by javax.imageio. The
    * dimension formulas give downstream decode queries an exact SQL
    * oracle: a correct decoder must read exactly these back out of
    * the PNG header. */
  def imagePayload(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 16)).toInt
    val h = (16 + math.floorMod(id, 9)).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // id-KEYED gradient rates (x·(7 + id%23), y·(131 + id%19)) —
        // the r17 fix for dHash family concentration: a globally
        // CONSTANT gradient gave every image the same wrap pattern
        // up to phase, collapsing 1,667 images into 844 exact dHash
        // families (top 58 of 16,670 at 10× — a corpus artifact the
        // sim-index probes then measured instead of the operator);
        // per-id rates make the cell-mean comparisons genuinely
        // id-dependent, the audio envelope's sibling
        img.setRGB(x, y, (id * 31 + x * (7 + math.floorMod(id, 23))
          + y * (131 + math.floorMod(id, 19))).toInt & 0xFFFFFF)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** The STRUCTURED signed 16-bit sample at sample index `j` of doc
    * `id`'s synthetic audio: a pseudo-noise carrier (the historical
    * byte arithmetic, reduced mod 251 and centered) multiplied by an
    * id- and family-keyed per-FRAME amplitude envelope. The envelope
    * is the fix for the r16 scale-probe diagnosis: near-noise
    * samples alone give every fingerprint window the same mean
    * |sample|, so adjacent-window energy differences collapse into a
    * handful of sign patterns and exact fingerprint families grow
    * superlinearly with corpus size (top family 24 → 80 at 10× — a
    * corpus artifact the d64/d67 probe ratios then measured instead
    * of the operators). `1 + (f · (1 + (id + ka) % 31)) % 97` makes
    * window energies strongly id- and position-dependent — diverse
    * the way real audio's are — while staying one integer expression
    * DuckDB re-derives exactly. The envelope rate keys on `id + ka`
    * so the (37, 11, 17) "unrelated recording" family gets a
    * DIFFERENT envelope than the (31, 7, 13) main family for the
    * same id (a shared envelope would give both near-proportional
    * window energies — identical sign fingerprints, turning the
    * planted unrelated row into a false near-dup). */
  private[graft] def audioSample(id: Long, ka: Long, kb: Long,
      km: Long, channels: Int, j: Int): Int = {
    val f = j / channels
    val carrier =
      ((id * ka + j * kb + (id >> 8) * (j % km)) % 251L).toInt - 125
    val env = 1 + ((f * (1 + (id + ka) % 31L)) % 97L).toInt
    carrier * env
  }

  /** Little-endian 16-bit PCM of [[audioSample]] over
    * frames × channels samples. */
  private def pcmBytes(id: Long, ka: Long, kb: Long, km: Long,
      channels: Int, frames: Int): Array[Byte] = {
    val data = new Array[Byte](frames * channels * 2)
    var j = 0
    while (j < frames * channels) {
      val s = audioSample(id, ka, kb, km, channels, j)
      data(2 * j) = (s & 0xFF).toByte
      data(2 * j + 1) = ((s >> 8) & 0xFF).toByte
      j += 1
    }
    data
  }

  private def wavOf(data: Array[Byte], sampleRate: Float,
      channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, channels, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic REAL PCM WAV for doc `id`: 16-bit little-endian
    * [[audioSample]] samples at an id-derived sample rate / channel
    * count / frame count, containerized by javax.sound.sampled's own
    * WAV writer. Like [[imagePayload]], the parameter formulas give
    * downstream decode queries an exact SQL oracle: a correct
    * decoder must read exactly these back out of the WAV header and
    * sample stream. */
  def audioPayload(id: Long): Array[Byte] = {
    val sampleRate = 8000 + math.floorMod(id, 8).toInt * 1000
    val channels = 1 + math.floorMod(id, 2).toInt
    val frames = 200 + math.floorMod(id, 100).toInt
    wavOf(pcmBytes(id, 31, 7, 13, channels, frames),
      sampleRate.toFloat, channels, frames)
  }

  // ---------------------------------------------------------------
  // Video: MJPEG in a RIFF/AVI container. AVI is byte-walkable pure
  // JVM (RIFF is fourcc + LE u32 size + data, even-padded; see the
  // public AVI RIFF spec), and MJPEG frames are plain JPEGs that
  // javax.imageio decodes — so, like PNG and WAV above, the whole
  // video path is real without any external codec.
  // ---------------------------------------------------------------

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def fcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def riffChunk(cc: String, data: Array[Byte]): Array[Byte] =
    fcc(cc) ++ le32(data.length.toLong) ++ data ++
      (if ((data.length & 1) == 1) Array(0.toByte) else Array.empty[Byte])
  private def riffList(listType: String, data: Array[Byte]): Array[Byte] =
    fcc("LIST") ++ le32(4L + data.length) ++ fcc(listType) ++ data

  /** Deterministic REAL MJPEG AVI for doc `id`: (2 + id%5) JPEG
    * frames of (16 + id%8·2) × (16 + id%6·2) id-derived pixels at
    * (5 + id%5) fps, in a spec-shaped RIFF container (avih + vids
    * strh/strf(MJPG) + movi 00dc chunks + idx1). The parameter
    * formulas give downstream decode queries an exact SQL oracle:
    * a correct demuxer+decoder must read exactly these back out of
    * the container and the frame JPEGs. */
  def videoPayload(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 8) * 2).toInt
    val h = (16 + math.floorMod(id, 6) * 2).toInt
    val fps = (5 + math.floorMod(id, 5)).toInt
    muxAvi(videoFrames(id), w, h, fps)
  }

  /** The deterministic JPEG frame set of [[videoPayload]], split out
    * so a REMUXED twin (same frames, different container timing) can
    * reuse the identical bytes. `fmt = "png"` swaps the per-frame
    * codec for LOSSLESS PNG (pixels survive encode→decode exactly),
    * which is what gives the d63b bit oracle its footing — the frame
    * pixel formula is doc_id+frame arithmetic, so with a lossless
    * codec DuckDB can re-derive every frame dHash bit while Spark
    * goes through the REAL mux → RIFF demux → ImageIO decode path
    * (ImageIO sniffs content, so the decode path is codec-agnostic).
    */
  private[graft] def videoFrames(id: Long,
      fmt: String = "jpg"): Array[Array[Byte]] = {
    val w = (16 + math.floorMod(id, 8) * 2).toInt
    val h = (16 + math.floorMod(id, 6) * 2).toInt
    val nFrames = (2 + math.floorMod(id, 5)).toInt
    Array.tabulate(nFrames) { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, (id * 31 + f * 17 + x * 7 + y * 131).toInt & 0xFFFFFF)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
  }

  /** [[videoPayload]] with LOSSLESS PNG frames in the same real AVI
    * container (codec fourcc "png " in both stream header and
    * BITMAPINFOHEADER) — the d63b oracle-twin corpus generator. */
  private[graft] def pngVideoPayload(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 8) * 2).toInt
    val h = (16 + math.floorMod(id, 6) * 2).toInt
    val fps = (5 + math.floorMod(id, 5)).toInt
    muxAvi(videoFrames(id, "png"), w, h, fps, codec = "png ")
  }

  /** The d63b corpus: one lossless-PNG AVI per id % 3 == 2 doc. */
  def withPlantedPngVideos(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .filter(id => math.floorMod(id, 3) == 2)
      .mapPartitions(_.map(id =>
        MediaRow(id, "video", pngVideoPayload(id))))
  }

  /** [[pngVideoPayload]]'s content RE-ENCODED, not remuxed: every
    * frame re-rendered with the [[perturbedImagePayload]] +12 clamp
    * inside one dHash cell region (a bounded perturbation — at most
    * the cell's two horizontal comparisons per row can flip, in
    * practice <= 2 bits), then muxed at fps + 2. The planted
    * same-content-different-encode duplicate: its frame BYTES differ
    * (an exact frame-hash fold misses it) while every aligned frame
    * stays within hamming maxDist — the case per-frame index
    * screening ([[graft.operators.Dedup
    * .screenVideosAgainstSimIndex]]) exists for. */
  private[graft] def reencodedPngVideoPayload(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 8) * 2).toInt
    val h = (16 + math.floorMod(id, 6) * 2).toInt
    val nFrames = (2 + math.floorMod(id, 5)).toInt
    val fps = (5 + math.floorMod(id, 5)).toInt + 2
    val (x0, x1) = (4 * w / 9, 5 * w / 9)
    val (y0, y1) = (3 * h / 8, 4 * h / 8)
    val frames = Array.tabulate(nFrames) { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val base = (id * 31 + f * 17 + x * 7 + y * 131).toInt & 0xFFFFFF
          val v = if (x >= x0 && x < x1 && y >= y0 && y < y1) {
            val r = math.min(((base >> 16) & 0xFF) + 12, 255)
            val g = math.min(((base >> 8) & 0xFF) + 12, 255)
            val b = math.min((base & 0xFF) + 12, 255)
            (r << 16) | (g << 8) | b
          } else base
          img.setRGB(x, y, v)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    muxAvi(frames, w, h, fps, codec = "png ")
  }

  /** [[pngVideoPayload]]'s frames remuxed at fps + 3: identical
    * lossless PNG bytes, different container timing — the planted
    * remux twin for the ORACLE-CHECKED video keep-one (d82). */
  private[graft] def remuxedPngVideoPayload(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 8) * 2).toInt
    val h = (16 + math.floorMod(id, 6) * 2).toInt
    val fps = (5 + math.floorMod(id, 5)).toInt + 3
    muxAvi(videoFrames(id, "png"), w, h, fps, codec = "png ")
  }

  /** The d82 corpus: each id % 3 == 2 doc's lossless-PNG AVI plus a
    * REMUXED twin at id + [[PlantedIdOffset]] (same PNG frame bytes,
    * fps + 3 container timing). Because PNG is lossless the twin's
    * per-frame dHashes are SQL-derivable from the same pixel formulas
    * as its src — the d81/d64b "twin carries the src arithmetic"
    * discipline lifted to video, which is what lets the FULL keep-one
    * composition (sigs → aligned-frame pairs → components → min-id
    * survivors) be oracle-checked instead of rows-only. */
  def withPlantedPngNearDupVideos(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .filter(id => math.floorMod(id, 3) == 2)
      .mapPartitions(_.flatMap(id => Iterator(
        MediaRow(id, "video", pngVideoPayload(id)),
        MediaRow(id + PlantedIdOffset, "video", remuxedPngVideoPayload(id)))))
  }

  /** RIFF/AVI muxing of pre-encoded MJPEG frames — the container
    * half of [[videoPayload]], shared with the remux twin. */
  private[graft] def muxAvi(frames: Array[Array[Byte]], w: Int, h: Int,
      fps: Int, codec: String = "MJPG"): Array[Byte] = {
    val nFrames = frames.length
    val avih = riffChunk("avih", // MainAVIHeader: 14 LE u32 fields
      le32(1000000L / fps) ++ le32(0) ++ le32(0) ++ le32(0x10 /*HASINDEX*/) ++
        le32(nFrames.toLong) ++ le32(0) ++ le32(1 /*streams*/) ++ le32(0) ++
        le32(w.toLong) ++ le32(h.toLong) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = riffChunk("strh", // AVIStreamHeader for the vids stream
      fcc("vids") ++ fcc(codec) ++ le32(0) ++ le16(0) ++ le16(0) ++
        le32(0) ++ le32(1 /*scale*/) ++ le32(fps.toLong /*rate*/) ++
        le32(0) ++ le32(nFrames.toLong) ++
        le32(frames.map(_.length).max.toLong) ++ le32(0xFFFFFFFFL) ++
        le32(0) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = riffChunk("strf", // BITMAPINFOHEADER, biCompression=codec
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
        fcc(codec) ++ le32(w.toLong * h * 3) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val movi = riffList("movi",
      frames.flatMap(fb => riffChunk("00dc", fb)))
    var off = 4L // idx1 offsets are relative to the 'movi' fourcc
    val idx1 = riffChunk("idx1", frames.flatMap { fb =>
      val e = fcc("00dc") ++ le32(0x10 /*KEYFRAME*/) ++ le32(off) ++
        le32(fb.length.toLong)
      off += 8L + fb.length + (fb.length & 1)
      e
    })
    val body = fcc("AVI ") ++ hdrl ++ movi ++ idx1
    fcc("RIFF") ++ le32(body.length.toLong) ++ body
  }

  /** Parsed AVI: container dims + vids timing + raw frame bytes. */
  private[operators] case class AviInfo(width: Int, height: Int,
      rate: Int, scale: Int, frames: Vector[Array[Byte]])

  /** Pure-JVM RIFF/AVI demux: walk chunks, pull the vids stream
    * header (rate/scale), the BITMAPINFOHEADER dims, and every video
    * frame ('##dc'/'##db') payload. Returns None on anything that is
    * not a plausible AVI (wrong magic, truncated chunks). */
  private[operators] def parseAvi(b: Array[Byte]): Option[AviInfo] = {
    def cc(p: Int): String = new String(b, p, 4, "US-ASCII")
    def u32(p: Int): Long = (b(p) & 0xFFL) | ((b(p + 1) & 0xFFL) << 8) |
      ((b(p + 2) & 0xFFL) << 16) | ((b(p + 3) & 0xFFL) << 24)
    if (b.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return None
    var width = -1; var height = -1; var rate = -1; var scale = -1
    var inVids = false
    val frames = Vector.newBuilder[Array[Byte]]
    var ok = true
    def walk(start: Int, end: Int): Unit = {
      var p = start
      while (ok && p + 8 <= end) {
        val id = cc(p)
        val sz = u32(p + 4)
        val ds = p + 8
        if (sz < 0 || ds + sz > end) { ok = false }
        else {
          id match {
            case "LIST" if sz >= 4 => walk(ds + 4, ds + sz.toInt)
            case "strh" if sz >= 36 =>
              inVids = cc(ds) == "vids"
              if (inVids) { scale = u32(ds + 20).toInt; rate = u32(ds + 24).toInt }
            case "strf" if inVids && sz >= 12 =>
              width = u32(ds + 4).toInt; height = u32(ds + 8).toInt
            case dc if dc.endsWith("dc") || dc.endsWith("db") =>
              frames += java.util.Arrays.copyOfRange(b, ds, ds + sz.toInt)
            case _ => ()
          }
          p = ds + sz.toInt + (sz.toInt & 1)
        }
      }
    }
    walk(12, math.min(8 + u32(4), b.length.toLong).toInt)
    val fs = frames.result()
    if (!ok || width <= 0 || rate <= 0 || scale <= 0 || fs.isEmpty) None
    else Some(AviInfo(width, height, rate, scale, fs))
  }

  /** Decoded video features, under video-native names. `width` and
    * `height` come from REALLY decoding the first frame's JPEG via
    * javax.imageio (not just the container header — a demuxer that
    * doesn't decode frames can't produce them), `frames` from the
    * demuxed chunk count, `fps` from the stream header rate/scale. */
  case class VideoFeatures(
      doc_id: Long,
      byte_len: Int,
      width: Int,
      height: Int,
      frames: Int,
      fps: Int)

  /** REAL video decode: RIFF/AVI demux + javax.imageio JPEG decode of
    * the first frame. Undecodable payloads surface as (-1,-1,-1,-1)
    * rather than an executor crash. Per-partition iterator shape like
    * [[decode]]. */
  def decodeVideo(spark: SparkSession, media: Dataset[MediaRow]): Dataset[VideoFeatures] = {
    import spark.implicits._
    // untyped Column filter: runs before object deserialization and
    // pushes to the scan, so non-video payloads never materialize
    media.filter(col("media_type") === "video").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        parseAvi(r.payload).flatMap { avi =>
          Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(avi.frames.head))).map { img =>
            VideoFeatures(r.doc_id, r.payload.length,
              img.getWidth, img.getHeight, avi.frames.size,
              math.round(avi.rate.toDouble / avi.scale).toInt)
          }
        }.getOrElse(VideoFeatures(r.doc_id, r.payload.length, -1, -1, -1, -1))
      }
    }
  }

  /** REAL frame sampling: demux the AVI and keep one frame per
    * `everyMs` of stream time (frame i lands at i·1000·scale/rate
    * ms). Payloads are the actual JPEG bytes out of the container —
    * the row-explosion shape (one input row → N frame rows) with a
    * real demuxer behind it. */
  def frameSampleVideo(spark: SparkSession, media: Dataset[MediaRow],
      everyMs: Long = 1000L): Dataset[Frame] = {
    import spark.implicits._
    media.filter(col("media_type") === "video").mapPartitions { rows =>
      rows.flatMap { r =>
        parseAvi(r.payload) match {
          case None => Iterator.empty
          case Some(avi) =>
            val stepMs = 1000.0 * avi.scale / avi.rate
            var nextDue = 0L
            avi.frames.iterator.zipWithIndex.flatMap { case (fb, i) =>
              val ts = math.round(i * stepMs)
              if (ts >= nextDue) {
                nextDue = ts + everyMs
                Iterator.single(Frame(r.doc_id, i, ts, fb))
              } else Iterator.empty
            }
        }
      }
    }
  }

  /** Media payloads with REAL bytes — all three types have JDK-only
    * codecs here: 'image' rows carry a genuine PNG ([[imagePayload]]),
    * 'audio' rows a genuine PCM WAV ([[audioPayload]]), 'video' rows
    * a genuine MJPEG AVI ([[videoPayload]]). */
  def withMediaPayload(docs: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val mt = math.floorMod(id, 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val payload = mt match {
            case "image" => imagePayload(id)
            case "audio" => audioPayload(id)
            case _ => videoPayload(id)
          }
          MediaRow(id, mt, payload)
        }
      }
  }

  /** Decode media features. Images are decoded FOR REAL via
    * javax.imageio — width/height/channels come out of the actual
    * PNG/JPEG/BMP bytes — and audio FOR REAL via javax.sound.sampled
    * (width carries the sample rate, height the frame count: the
    * audio analogues of image dimensions — [[decodeAudio]] returns
    * them under their own names), and video FOR REAL via the RIFF/AVI
    * demuxer + javax.imageio on the first MJPEG frame ([[decodeVideo]]
    * returns the full video-native feature set). Undecodable payloads
    * surface as (-1, -1, -1) rather than an executor crash. One codec
    * context per partition (ImageIO cache off: payloads are
    * in-memory, a disk-backed cache would only add I/O). */
  def decode(spark: SparkSession, media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition codec init
      rows.map { r =>
        r.media_type match {
          case "image" =>
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.payload))
            if (img == null)
              MediaFeatures(r.doc_id, r.media_type, r.payload.length, -1, -1, -1)
            else MediaFeatures(r.doc_id, r.media_type, r.payload.length,
              img.getWidth, img.getHeight,
              img.getColorModel.getNumColorComponents)
          case "audio" =>
            try {
              val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
                new java.io.ByteArrayInputStream(r.payload))
              MediaFeatures(r.doc_id, r.media_type, r.payload.length,
                ff.getFormat.getSampleRate.toInt, ff.getFrameLength,
                ff.getFormat.getChannels)
            } catch {
              case _: javax.sound.sampled.UnsupportedAudioFileException =>
                MediaFeatures(r.doc_id, r.media_type, r.payload.length, -1, -1, -1)
            }
          case _ => // video: RIFF/AVI demux + first-frame JPEG decode
            parseAvi(r.payload).flatMap { avi =>
              Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(avi.frames.head))).map { img =>
                MediaFeatures(r.doc_id, r.media_type, r.payload.length,
                  img.getWidth, img.getHeight,
                  img.getColorModel.getNumColorComponents)
              }
            }.getOrElse(
              MediaFeatures(r.doc_id, r.media_type, r.payload.length, -1, -1, -1))
        }
      }
    }
  }

  /** Decoded audio header features, under audio-native names. */
  case class AudioFeatures(
      doc_id: Long,
      byte_len: Int,
      sample_rate: Int,
      channels: Int,
      frames: Int)

  /** REAL audio decode via javax.sound.sampled: sample rate, channel
    * count and frame count come out of the actual WAV/AIFF header
    * bytes (getAudioFileFormat parses the container header without
    * decoding samples). Undecodable payloads surface as (-1, -1, -1).
    * Per-partition iterator shape like [[decode]]. */
  def decodeAudio(spark: SparkSession, media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.filter(col("media_type") === "audio").mapPartitions { rows =>
      rows.map { r =>
        try {
          val ff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(r.payload))
          AudioFeatures(r.doc_id, r.payload.length,
            ff.getFormat.getSampleRate.toInt, ff.getFormat.getChannels,
            ff.getFrameLength)
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException =>
            AudioFeatures(r.doc_id, r.payload.length, -1, -1, -1)
        }
      }
    }
  }

  /** REAL image resize via java.awt: decode, scale to fit
    * (targetW, targetH) preserving aspect, re-encode as PNG. Only
    * image rows are transformed. */
  def resizeImages(spark: SparkSession, media: Dataset[MediaRow],
      targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.filter(_.media_type == "image").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        val scale = math.min(targetW.toDouble / src.getWidth,
          targetH.toDouble / src.getHeight)
        val w = math.max((src.getWidth * scale).toInt, 1)
        val h = math.max((src.getHeight * scale).toInt, 1)
        val out = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, w, h, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        ResizedMedia(r.doc_id, r.media_type, w, h, bos.toByteArray)
      }
    }
  }

  /** A resized image row (payload replaced by the resized bytes). */
  case class ResizedMedia(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** A sampled frame: one row per (video, frame index). */
  case class Frame(doc_id: Long, frame_idx: Int, ts_ms: Long, payload: Array[Byte])

  /** An extracted media embedding (what a vision/audio encoder
    * produces; feeds the Similarity ANN operators directly). */
  case class MediaEmbedding(doc_id: Long, media_type: String,
      embedding: Array[Float])

  /** Byte-histogram media featurizer: a deterministic L2-normalized
    * `dim`-bucket byte histogram per payload — a real (if crude)
    * content embedding that feeds the Similarity ANN operators
    * directly (schema Array[Float], per-partition batching, cosine
    * math all exercised for real). A production deployment swaps the
    * histogram for a learned encoder loaded once per partition —
    * the model-hosting shape is the only thing this featurizer
    * doesn't exercise. */
  def byteHistogramFeatures(spark: SparkSession, media: Dataset[MediaRow],
      dim: Int = 16): Dataset[MediaEmbedding] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition encoder/model init would happen here
      rows.map { r =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < r.payload.length) {
          v(math.floorMod(r.payload(i), dim)) += 1f
          i += 1
        }
        var ss = 0.0
        v.foreach(x => ss += x * x)
        val n = math.max(math.sqrt(ss), 1e-6).toFloat
        MediaEmbedding(r.doc_id, r.media_type, v.map(_ / n))
      }
    }
  }

  /** Metadata-only projection (no decode, binary column pruned):
    * byte length + content hash + deterministic fake dimensions —
    * fully expression-based, so it has an exact DuckDB oracle. */
  def metadata(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"), col("media_type"),
      length(col("payload")).cast("int").as("byte_len"),
      md5(col("payload")).as("content_hash"),
      (lit(64) + (length(col("payload")) % 16) * 32).cast("int").as("width"),
      (lit(64) + (length(col("payload")) % 9) * 32).cast("int").as("height"),
      when(col("media_type") === "audio", 1).otherwise(3).as("channels"))

  // ---------------------------------------------------------------
  // Perceptual image near-dedup: dHash64 over REAL decoded pixels,
  // fed into the SAME multi-index hamming machinery text SimHash
  // uses (Dedup.simhashPairsFromSigs) — the multimodal half of the
  // near-dedup loop. At 100 TB the decode+hash is a map-only scan
  // (one 64-bit signature per image crosses the network, never
  // pixels), and candidate generation stays the skew-guarded
  // chunk-bucket equi-join — no new shuffle shape.
  // ---------------------------------------------------------------

  /** 64-bit difference hash of an encoded image: ImageIO decode
    * (real PNG/JPEG/BMP bytes), integer luma ((77r+151g+28b)>>8),
    * 9×8 AREA-AVERAGE downscale in pure integer arithmetic (no AWT
    * scaler — deterministic on any JVM/platform), then one bit per
    * horizontal gradient sign: bit (cy*8+cx) = cell(cx+1,cy) >
    * cell(cx,cy). Gradient signs make the hash invariant to global
    * brightness shifts and robust to mild noise — the property
    * MultimodalSpec pins. None for undecodable payloads or images
    * smaller than the 9×8 grid. */
  def dHash64(payload: Array[Byte]): Option[Long] = {
    val img = try javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    catch { case _: java.io.IOException => null }
    if (img == null || img.getWidth < 9 || img.getHeight < 8) None
    else {
      val w = img.getWidth; val h = img.getHeight
      val avg = Array.ofDim[Long](8, 9)
      var cy = 0
      while (cy < 8) {
        val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
        var cx = 0
        while (cx < 9) {
          val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val rgb = img.getRGB(x, y)
              sum += (77 * ((rgb >> 16) & 0xFF) + 151 * ((rgb >> 8) & 0xFF) +
                28 * (rgb & 0xFF)) >> 8
              x += 1
            }
            y += 1
          }
          avg(cy)(cx) = sum / ((y1 - y0).toLong * (x1 - x0))
          cx += 1
        }
        cy += 1
      }
      var bits = 0L; var k = 0
      cy = 0
      while (cy < 8) {
        var cx = 0
        while (cx < 8) {
          if (avg(cy)(cx + 1) > avg(cy)(cx)) bits |= 1L << k
          k += 1; cx += 1
        }
        cy += 1
      }
      Some(bits)
    }
  }

  /** (doc_id, sim) dHash signatures of the image rows — the exact
    * input contract of [[graft.operators.Dedup.simhashPairsFromSigs]].
    * Map-only: pixels never leave the task. */
  def imageDHashSigs(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.filter(_.media_type == "image").mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap(r => dHash64(r.payload).map(sig => (r.doc_id, sig)))
    }.toDF("doc_id", "sim")
  }

  /** Perceptual near-dup image pairs at hamming <= maxDist: dHash
    * signatures through the skew-guarded multi-index hamming search
    * text SimHash uses. Returns (id_a, id_b, hamming). */
  def imageNearDupPairs(spark: SparkSession, media: Dataset[MediaRow],
      maxDist: Int = 2): DataFrame =
    Dedup.simhashPairsFromSigs(imageDHashSigs(spark, media), maxDist)

  /** The d52 corpus: every image doc's REAL PNG plus a PLANTED
    * near-identical twin at id + [[PlantedIdOffset]] — same pixel
    * field re-encoded with a brightness bump on one vertical stripe
    * (a couple of gradient cells move → hamming stays small but
    * usually nonzero), the standard near-dup-bench construction. */
  val PlantedIdOffset: Long = 10000000L

  def withPlantedNearDupImages(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .filter(id => math.floorMod(id, 3) == 0)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          Iterator(
            MediaRow(id, "image", imagePayload(id)),
            MediaRow(id + PlantedIdOffset, "image", perturbedImagePayload(id)))
        }
      }
  }

  /** [[imagePayload]]'s pixel field with +12 luma on exactly the
    * source region of ONE dHash cell (cx=4, cy=3 — the same
    * x*w/9 / y*h/8 ranges [[dHash64]] averages), so at most the two
    * horizontal comparisons touching that cell can flip: the twin is
    * visually near-identical and GUARANTEED within hamming 2. */
  private[graft] def perturbedImagePayload(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 16)).toInt
    val h = (16 + math.floorMod(id, 9)).toInt
    val (x0, x1) = (4 * w / 9, 5 * w / 9)
    val (y0, y1) = (3 * h / 8, 4 * h / 8)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // identical base arithmetic to imagePayload (id-keyed rates)
        val base = (id * 31 + x * (7 + math.floorMod(id, 23))
          + y * (131 + math.floorMod(id, 19))).toInt & 0xFFFFFF
        val v = if (x >= x0 && x < x1 && y >= y0 && y < y1) {
          val r = math.min(((base >> 16) & 0xFF) + 12, 255)
          val g = math.min(((base >> 8) & 0xFF) + 12, 255)
          val b = math.min((base & 0xFF) + 12, 255)
          (r << 16) | (g << 8) | b
        } else base
        img.setRGB(x, y, v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ---------------------------------------------------------------
  // Perceptual VIDEO near-dedup: dHash64 per demuxed frame, videos
  // paired when EVERY aligned sampled frame matches — the remux /
  // re-encode dup (same content in a different container, the
  // overwhelmingly common video duplicate) under the same hamming
  // machinery as images/text. At 100 TB: demux+decode+hash is a
  // map-only scan (one 64-bit sig per sampled frame crosses the
  // network, never pixels), candidate generation stays the
  // skew-guarded chunk-bucket equi-join on a composite
  // (video, frame) key, and the video-level verdict is one
  // (vid_a, vid_b)-keyed hash aggregate over frame pairs.
  // ---------------------------------------------------------------

  /** Frame-index bound for the composite (video, frame) pairing key:
    * doc_id·1024 + frame_idx must not collide across videos. 1024
    * sampled frames ≈ 17 min at one sample/second — raise everyMs,
    * not the bound, for longer footage. */
  val MaxSampledFrames: Long = 1024L

  /** Per-sampled-frame dHash signatures of the video rows: RIFF/AVI
    * demux ([[frameSampleVideo]]), javax.imageio JPEG decode,
    * [[dHash64]] — one (doc_id, frame_idx, sim) row per decodable
    * sampled frame. `everyMs = 0` hashes every frame. Map-only:
    * pixels never leave the task. */
  def videoFrameDHashSigs(spark: SparkSession, media: Dataset[MediaRow],
      everyMs: Long = 0L): DataFrame = {
    import spark.implicits._
    frameSampleVideo(spark, media, everyMs).mapPartitions { frames =>
      javax.imageio.ImageIO.setUseCache(false)
      frames.flatMap(f =>
        dHash64(f.payload).map(sig => (f.doc_id, f.frame_idx, sig)))
    }.toDF("doc_id", "frame_idx", "sim")
  }

  /** Perceptual near-dup VIDEO pairs: two videos pair iff they
    * sampled the SAME number of decodable frames and every aligned
    * frame pair (same frame_idx) is within hamming <= maxDist — the
    * remux/re-encode duplicate contract (a truncation or re-cut is a
    * different video under it, deliberately). Frame candidates ride
    * [[graft.operators.Dedup.simhashPairsFromSigs]] on a composite
    * doc_id·1024 + frame_idx key (fail-loud above the bound), then
    * one (vid_a, vid_b) hash aggregate checks the all-frames-match
    * condition against each side's sampled-frame count.
    * Returns (id_a, id_b, n_frames, max_hamming). */
  def videoNearDupPairs(spark: SparkSession, media: Dataset[MediaRow],
      maxDist: Int = 2, everyMs: Long = 0L): DataFrame = {
    val sigs = videoFrameDHashSigs(spark, media, everyMs)
      .localCheckpoint(true) // two consumers: pairing + counts
    videoNearDupPairsFromSigs(sigs, maxDist)
  }

  /** [[videoNearDupPairs]] from already-materialized per-frame sigs
    * ((doc_id, frame_idx, sim) rows) — the entry point for
    * compositions that reuse one decode pass for both pairing and
    * the keep-one universe (d82). Caller owns pinning `sigs` if the
    * plan consumes them more than once. */
  def videoNearDupPairsFromSigs(sigs: DataFrame, maxDist: Int = 2): DataFrame = {
    val keyed = sigs.select(
      (col("doc_id") * MaxSampledFrames +
        when(col("frame_idx") >= MaxSampledFrames, raise_error(concat(
          lit(s"videoNearDupPairs: frame_idx >= $MaxSampledFrames "),
          lit("(raise everyMs to sample longer footage)"))))
          .otherwise(col("frame_idx"))).as("doc_id"),
      col("sim"))
    val framePairs = Dedup.simhashPairsFromSigs(keyed, maxDist)
      .select(
        expr(s"id_a div $MaxSampledFrames").as("vid_a"),
        expr(s"id_a % $MaxSampledFrames").as("fi_a"),
        expr(s"id_b div $MaxSampledFrames").as("vid_b"),
        expr(s"id_b % $MaxSampledFrames").as("fi_b"),
        col("hamming"))
      .filter(col("vid_a") =!= col("vid_b") && col("fi_a") === col("fi_b"))
    val counts = sigs.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
    framePairs
      .groupBy(col("vid_a"), col("vid_b"))
      .agg(count(lit(1)).as("n_frames"), max(col("hamming")).as("max_hamming"))
      .join(counts.select(col("doc_id").as("vid_a"), col("nf").as("nf_a"))
        .hint("SHUFFLE_HASH"), Seq("vid_a"))
      .join(counts.select(col("doc_id").as("vid_b"), col("nf").as("nf_b"))
        .hint("SHUFFLE_HASH"), Seq("vid_b"))
      .filter(col("n_frames") === col("nf_a") &&
        col("n_frames") === col("nf_b"))
      .select(col("vid_a").as("id_a"), col("vid_b").as("id_b"),
        col("n_frames"), col("max_hamming"))
  }

  /** The d63 corpus: every video doc's REAL MJPEG AVI plus a REMUXED
    * twin at id + [[PlantedIdOffset]] — byte-identical JPEG frames in
    * a container with different timing (fps + 3), the
    * same-content-different-container duplicate. Frame dHashes are
    * identical (hamming 0) while the payload bytes differ. */
  def withPlantedNearDupVideos(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .filter(id => math.floorMod(id, 3) == 2)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          Iterator(
            MediaRow(id, "video", videoPayload(id)),
            MediaRow(id + PlantedIdOffset, "video", remuxedVideoPayload(id)))
        }
      }
  }

  /** [[videoPayload]]'s frames remuxed at fps + 3: identical JPEG
    * bytes, different container timing — the planted remux twin. */
  private[graft] def remuxedVideoPayload(id: Long): Array[Byte] = {
    val w = (16 + math.floorMod(id, 8) * 2).toInt
    val h = (16 + math.floorMod(id, 6) * 2).toInt
    val fps = (5 + math.floorMod(id, 5)).toInt + 3
    muxAvi(videoFrames(id), w, h, fps)
  }

  // ---------------------------------------------------------------
  // Perceptual AUDIO near-dedup: a 64-bit energy-gradient
  // fingerprint over REAL WAV decode — 65 equal frame windows, one
  // bit per consecutive-window mean-|sample| comparison. Gradient
  // signs make it invariant to global gain (the audio analog of
  // dHash's brightness invariance) and to the declared sample rate
  // (windows index FRAMES, not seconds) — so a remuxed/relabeled
  // copy fingerprints identically. Same 100 TB posture as dHash:
  // map-only decode+hash, skew-guarded hamming pairing. And because
  // WAV PCM is lossless and the planted corpus's samples are doc_id
  // arithmetic, the whole path has an exact SQL oracle (d64b) — the
  // d52b discipline.
  // ---------------------------------------------------------------

  /** 64-bit energy-gradient fingerprint of an encoded audio payload:
    * javax.sound decode (16-bit LE PCM), mean |sample| over 65
    * frame-partition windows (all channels pooled, integer
    * arithmetic), bit k = mean(k+1) > mean(k). None for undecodable
    * payloads, non-16-bit/big-endian encodings, or clips shorter
    * than 65 frames. */
  def audioFingerprint64(payload: Array[Byte]): Option[Long] = {
    val decoded =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) None
        else Some((ais.readAllBytes(), fmt.getChannels))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
    decoded.flatMap { case (bytes, ch) =>
      val nFrames = bytes.length / (2 * ch)
      if (nFrames < 65) None
      else {
        val e = new Array[Long](65)
        var w = 0
        while (w < 65) {
          val f0 = w * nFrames / 65
          val f1 = (w + 1) * nFrames / 65
          var sum = 0L
          var f = f0
          while (f < f1) {
            var c = 0
            while (c < ch) {
              val j = (f * ch + c) * 2
              val v = ((bytes(j) & 0xFF) | (bytes(j + 1) << 8)).toShort.toInt
              sum += math.abs(v)
              c += 1
            }
            f += 1
          }
          e(w) = sum / ((f1 - f0).toLong * ch)
          w += 1
        }
        var bits = 0L
        var k = 0
        while (k < 64) {
          if (e(k + 1) > e(k)) bits |= 1L << k
          k += 1
        }
        Some(bits)
      }
    }
  }

  /** (doc_id, sim) audio fingerprints of the audio rows — the exact
    * input contract of [[graft.operators.Dedup.simhashPairsFromSigs]].
    * Map-only: samples never leave the task. */
  def audioFingerprintSigs(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.filter(_.media_type == "audio").mapPartitions { rows =>
      rows.flatMap(r => audioFingerprint64(r.payload).map(fp => (r.doc_id, fp)))
    }.toDF("doc_id", "sim")
  }

  /** Perceptual near-dup audio pairs at hamming <= maxDist through
    * the skew-guarded multi-index hamming search. (id_a, id_b,
    * hamming). */
  def audioNearDupPairs(spark: SparkSession, media: Dataset[MediaRow],
      maxDist: Int = 2): DataFrame =
    Dedup.simhashPairsFromSigs(audioFingerprintSigs(spark, media), maxDist)

  /** The d64 corpus: every audio doc's REAL PCM WAV plus a REMUXED
    * twin at id + [[PlantedIdOffset]] — byte-identical samples and
    * channel count under a different declared sample rate (a
    * relabeled/remuxed copy). Fingerprints are identical (hamming 0)
    * while the payload bytes differ. */
  def withPlantedNearDupAudio(docs: DataFrame, idCol: String): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long]
      .filter(id => math.floorMod(id, 3) == 1)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          Iterator(
            MediaRow(id, "audio", audioPayload(id)),
            MediaRow(id + PlantedIdOffset, "audio", remuxedAudioPayload(id)))
        }
      }
  }

  /** One 64-bit perceptual signature per media row — the uniform
    * contract the persistent signature index
    * ([[graft.operators.Dedup.buildSimIndex]]) and the streaming
    * media ingest screen consume: image → [[dHash64]] (near-dup at
    * hamming ≤ 2), audio → [[audioFingerprint64]] (gain/rate-label
    * invariant), video → an EXACT combined frame-signature hash (a
    * deterministic fold over the per-frame dHashes in frame order —
    * remuxed/retimed copies hash identically since their frame
    * dHashes do, but per-frame NEAR matches do not survive the fold:
    * video NEAR dedup is [[videoNearDupPairs]]'s batch job, by
    * design). Rows whose payload is undecodable are absent. Map-only:
    * pixels/samples never leave the task. */
  def mediaSigs(spark: SparkSession, media: Dataset[MediaRow]): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.flatMap { r =>
        val sig = r.media_type match {
          case "image" => dHash64(r.payload)
          case "audio" => audioFingerprint64(r.payload)
          case "video" => parseAvi(r.payload).flatMap { avi =>
            val hs = avi.frames.flatMap(fb => dHash64(fb))
            if (hs.isEmpty) None
            else Some(hs.foldLeft(1125899906842597L)(
              (acc, h) => acc * 1000003L + h))
          }
          case _ => None
        }
        sig.map(s => (r.doc_id, r.media_type, s))
      }
    }.toDF("doc_id", "media_type", "sim")
  }

  /** An audio payload UNRELATED to [[audioPayload]]`(id)`: identical
    * container shape (same rate/channels/frames formulas) but a
    * different sample arithmetic ((id·37 + i·11) & 0xFF) — the
    * "different recording, same format" row for screen tests and the
    * d67 oracle. */
  private[graft] def unrelatedAudioPayload(id: Long): Array[Byte] = {
    val sampleRate = 8000 + math.floorMod(id, 8).toInt * 1000
    val channels = 1 + math.floorMod(id, 2).toInt
    val frames = 200 + math.floorMod(id, 100).toInt
    // different carrier constants AND (via id + ka) a different
    // envelope than audioPayload(id) — see [[audioSample]]
    wavOf(pcmBytes(id, 37, 11, 17, channels, frames),
      sampleRate.toFloat, channels, frames)
  }

  /** [[audioPayload]]'s samples re-containerized at a fixed 22050 Hz
    * label: same PCM bytes and channel layout, different declared
    * rate — the planted remux twin. */
  private[graft] def remuxedAudioPayload(id: Long): Array[Byte] = {
    val channels = 1 + math.floorMod(id, 2).toInt
    val frames = 200 + math.floorMod(id, 100).toInt
    // identical samples to audioPayload (same constants, same
    // envelope) under a different declared rate — the remux twin
    wavOf(pcmBytes(id, 31, 7, 13, channels, frames),
      22050f, channels, frames)
  }
}
