package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Multimodal, TextAnalysis}

/** Winnowing fingerprints + multimodal decode/resize/featurize paths
  * (the pieces without SQL oracles). */
class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fingerprints overlap heavily for near-dup texts, little for unrelated") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the forest"
    val df = TextAnalysis.withFingerprints(Seq(
      (0L, base),
      (1L, base.replace("forest", "meadow")),
      (2L, "entirely unrelated text talking about database query planners and storage")
    ).toDF("doc_id", "text"), "text").select(col("doc_id"), col("fp"))
    val fps = df.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet).toMap
    def overlap(a: Set[Long], b: Set[Long]) =
      (a intersect b).size.toDouble / (a union b).size
    assert(overlap(fps(0L), fps(1L)) > 0.6)
    assert(overlap(fps(0L), fps(2L)) < 0.1)
    // deterministic across evaluations
    val again = df.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getSeq[Long](1).toSet).toMap
    assert(again == fps)
  }

  test("token counts: whitespace vs BPE-ish regex") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "hello world, it's 42 degrees!"), (2L, ""), (3L, "  one  "))
      .toDF("id", "text")
      .select(col("id"),
        TextAnalysis.wsTokenCount(col("text")).as("ws"),
        TextAnalysis.bpeTokenCount(col("text")).as("bpe"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(m(1L)._1 == 5)
    // hello|world|,|it|'|s|42|degrees|! = 9
    assert(m(1L)._2 == 9)
    assert(m(2L) == ((0, 0)))
    assert(m(3L)._1 == 1)
  }

  test("real image decode reads back the encoded PNG dimensions via javax.imageio") {
    import spark.implicits._
    val docs = (0L until 48L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withMediaPayload(docs, "doc_id", "text")
    // image payloads are genuine PNGs
    val png = media.filter(_.media_type == "image").head().payload
    assert(png.take(8).map(_ & 0xFF).toSeq ==
      Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), "not a PNG header")

    val feats = Multimodal.decode(spark, media).collect().sortBy(_.doc_id)
    assert(feats.length == 48)
    feats.filter(_.media_type == "image").foreach { f =>
      assert(f.width == 16 + (f.doc_id % 16).toInt, s"$f")
      assert(f.height == 16 + (f.doc_id % 9).toInt, s"$f")
      assert(f.channels == 3, s"$f")
    }
    // audio decodes for real too: width carries the sample rate,
    // height the frame count, straight out of the WAV header
    feats.filter(_.media_type == "audio").foreach { f =>
      assert(f.width == 8000 + (f.doc_id % 8).toInt * 1000, s"$f")
      assert(f.height == 200 + (f.doc_id % 100).toInt, s"$f")
      assert(f.channels == 1 + (f.doc_id % 2).toInt, s"$f")
    }

    // an undecodable "image" surfaces as -1 dims, not a crash
    val bad = Seq(Multimodal.MediaRow(99L, "image", Array[Byte](1, 2, 3))).toDS()
    val badFeat = Multimodal.decode(spark, bad).head()
    assert(badFeat.width == -1 && badFeat.height == -1 && badFeat.channels == -1)
  }

  test("dHash64: brightness-invariant, noise-tolerant, deterministic over real PNG decode") {
    // brightness invariance: +c on EVERY pixel keeps all gradient
    // signs (below saturation), so the hash is bit-identical
    def png(id: Long, bump: Int, all: Boolean): Array[Byte] = {
      val w = 24; val h = 20
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val base = (id * 31 + x * 7 + y * 131).toInt & 0x7F7F7F // headroom
        val v = if (all || x == w / 2) {
          (((base >> 16) & 0xFF) + bump << 16) |
            ((((base >> 8) & 0xFF) + bump) << 8) | ((base & 0xFF) + bump)
        } else base
        img.setRGB(x, y, v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (id <- 0L until 10L) {
      val base = Multimodal.dHash64(png(id, 0, all = false)).get
      assert(Multimodal.dHash64(png(id, 40, all = true)).get == base,
        s"global brightness shifted the hash for id=$id")
      // a single source-column bump lands in one grid column: at most
      // its two horizontal comparisons per row can flip (<= 16 bits,
      // typically far fewer) — a localized edit stays localized
      assert(ham(Multimodal.dHash64(png(id, 25, all = false)).get, base) <= 16)
      // determinism across repeated decodes
      assert(Multimodal.dHash64(png(id, 0, all = false)).get == base)
    }
    // undecodable and too-small payloads yield None, not a crash
    assert(Multimodal.dHash64(Array[Byte](1, 2, 3)).isEmpty)
    val tiny = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", bos)
    assert(Multimodal.dHash64(bos.toByteArray).isEmpty)
  }

  test("d52: every planted near-identical PNG twin is recovered at hamming <= 2") {
    import spark.implicits._
    val docs = (0L until 90L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withPlantedNearDupImages(docs, "doc_id")
    val imageIds = (0L until 90L).filter(_ % 3 == 0)
    assert(media.count() == imageIds.size * 2L)
    val pairs = Multimodal.imageNearDupPairs(spark, media, maxDist = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    imageIds.foreach { id =>
      val key = (id, id + Multimodal.PlantedIdOffset)
      assert(pairs.contains(key), s"planted twin of $id not recovered")
      assert(pairs(key) <= 2)
    }
    // and the per-pair hamming is the true popcount of the signatures
    val sigs = Multimodal.imageDHashSigs(spark, media)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    pairs.foreach { case ((a, b), d) =>
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) == d)
    }
  }

  test("d63: every planted remux twin pairs at hamming 0; truncated copies never pair") {
    import spark.implicits._
    val docs = (0L until 90L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withPlantedNearDupVideos(docs, "doc_id")
    val videoIds = (0L until 90L).filter(_ % 3 == 2)
    assert(media.count() == videoIds.size * 2L)
    // the twin is the SAME frames in a retimed container: different
    // payload bytes, identical frame dHashes
    videoIds.take(3).foreach { id =>
      assert(!java.util.Arrays.equals(Multimodal.videoPayload(id),
        Multimodal.remuxedVideoPayload(id)), "twin bytes must differ")
    }
    val pairs = Multimodal.videoNearDupPairs(spark, media, maxDist = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    val frameCount = videoIds.map(id => id -> (2 + id % 5)).toMap
    videoIds.foreach { id =>
      val key = (id, id + Multimodal.PlantedIdOffset)
      assert(pairs.contains(key), s"planted remux twin of $id not recovered")
      val (nf, maxHam) = pairs(key)
      assert(nf == frameCount(id), s"twin of $id matched $nf frames")
      assert(maxHam == 0, s"remuxed frames must hash identically, got $maxHam")
    }
    // the all-aligned-frames contract: a pair can only exist between
    // videos with the SAME sampled-frame count
    val nfOf = (id: Long) => frameCount(if (id >= Multimodal.PlantedIdOffset)
      id - Multimodal.PlantedIdOffset else id)
    pairs.keys.foreach { case (a, b) =>
      assert(nfOf(a) == nfOf(b), s"pair ($a,$b) spans frame counts")
    }
    // a truncated copy (one frame dropped) is a different video
    val base = 2L
    val w = (16 + base % 8 * 2).toInt; val h = (16 + base % 6 * 2).toInt
    val truncated = Multimodal.muxAvi(
      Multimodal.videoFrames(base).dropRight(1), w, h, 5)
    val withTrunc = media.union(Seq(
      Multimodal.MediaRow(777777L, "video", truncated)).toDS())
    val tp = Multimodal.videoNearDupPairs(spark, withTrunc, maxDist = 2)
      .filter($"id_a" === 777777L || $"id_b" === 777777L).count()
    assert(tp == 0, "a truncated copy must not pair")
  }

  test("d63b: lossless PNG frames survive the real AVI path; sigs equal direct pixel hashing") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withPlantedPngVideos(docs, "doc_id")
    val sigs = Multimodal.videoFrameDHashSigs(spark, media)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val videoIds = (0L until 30L).filter(_ % 3 == 2)
    // every frame demuxed and decoded; the mux→demux→decode path is
    // pixel-lossless, so each frame's sig equals dHash64 of the PNG
    // bytes that went INTO the container
    videoIds.foreach { id =>
      val frames = Multimodal.videoFrames(id, "png")
      assert(frames.indices.forall(f => sigs.contains((id, f))),
        s"video $id lost frames through the container")
      frames.zipWithIndex.foreach { case (fb, f) =>
        assert(sigs((id, f)) == Multimodal.dHash64(fb).get,
          s"frame ($id, $f) sig drifted through mux/demux")
      }
    }
    assert(sigs.size == videoIds.map(id => 2 + id % 5).sum)
  }

  test("d82: video keep-one collapses each remuxed-PNG twin family to its min id") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withPlantedPngNearDupVideos(docs, "doc_id")
    val videoIds = (0L until 60L).filter(_ % 3 == 2)
    assert(media.count() == videoIds.size * 2L)
    // the twin is the same lossless frames in a retimed container:
    // different payload bytes, identical per-frame sigs
    videoIds.take(3).foreach { id =>
      assert(!java.util.Arrays.equals(Multimodal.pngVideoPayload(id),
        Multimodal.remuxedPngVideoPayload(id)), "twin bytes must differ")
    }
    val sigs = Multimodal.videoFrameDHashSigs(spark, media)
      .localCheckpoint(true)
    val pairs = Multimodal.videoNearDupPairsFromSigs(sigs, maxDist = 2)
      .select($"id_a", $"id_b")
    val kept = graft.operators.Dedup.dropNearDuplicates(
      sigs.select($"doc_id").distinct(), "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    // every family {id, id + offset} collapses to the src (min id);
    // no twin survives, no src is lost
    assert(kept == videoIds.toSet,
      s"survivors ${kept.toSeq.sorted} != srcs $videoIds")
    // an unrelated singleton (no twin) always survives keep-one
    val lone = Multimodal.MediaRow(999999L, "video",
      Multimodal.pngVideoPayload(999999L))
    val sigs2 = Multimodal.videoFrameDHashSigs(
      spark, media.union(Seq(lone).toDS())).localCheckpoint(true)
    val kept2 = graft.operators.Dedup.dropNearDuplicates(
      sigs2.select($"doc_id").distinct(), "doc_id",
      Multimodal.videoNearDupPairsFromSigs(sigs2, maxDist = 2)
        .select($"id_a", $"id_b"))
      .collect().map(_.getLong(0)).toSet
    assert(kept2.contains(999999L), "a twin-less video must survive")
  }

  test("d64: audio fingerprint is gain- and rate-label-invariant; planted twins pair at hamming 0") {
    import spark.implicits._
    // gain invariance: scaling every sample by a constant preserves
    // all window-mean orderings (the dHash brightness analog)
    def wav(samples: Array[Int], ch: Int, rate: Float): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(rate, 16, ch, true, false)
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, i) =>
        data(2 * i) = (v & 0xFF).toByte
        data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt,
        (samples.length / ch).toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rnd = new scala.util.Random(7)
    val samples = Array.fill(400)(rnd.nextInt(2001) - 1000)
    val base = Multimodal.audioFingerprint64(wav(samples, 1, 8000f)).get
    assert(Multimodal.audioFingerprint64(
      wav(samples.map(_ * 3), 1, 8000f)).get == base,
      "a 3x gain changed the fingerprint")
    assert(Multimodal.audioFingerprint64(
      wav(samples, 1, 44100f)).get == base,
      "a sample-rate relabel changed the fingerprint")
    // short clips and junk yield None, not a crash
    assert(Multimodal.audioFingerprint64(
      wav(samples.take(40), 1, 8000f)).isEmpty)
    assert(Multimodal.audioFingerprint64(Array[Byte](9, 9, 9)).isEmpty)
    // planted corpus: every remux twin recovered at hamming 0
    val docs = (0L until 90L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withPlantedNearDupAudio(docs, "doc_id")
    val audioIds = (0L until 90L).filter(_ % 3 == 1)
    assert(media.count() == audioIds.size * 2L)
    audioIds.take(3).foreach { id =>
      assert(!java.util.Arrays.equals(Multimodal.audioPayload(id),
        Multimodal.remuxedAudioPayload(id)), "twin bytes must differ")
    }
    val pairs = Multimodal.audioNearDupPairs(spark, media, maxDist = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    audioIds.foreach { id =>
      val key = (id, id + Multimodal.PlantedIdOffset)
      assert(pairs.contains(key), s"planted remux twin of $id not recovered")
      assert(pairs(key) == 0, s"remuxed samples must fingerprint identically")
    }
  }

  test("real audio decode reads back WAV header params via javax.sound.sampled") {
    import spark.implicits._
    val docs = (0L until 48L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withMediaPayload(docs, "doc_id", "text")
    // audio payloads are genuine RIFF/WAVE containers
    val wav = media.filter(_.media_type == "audio").head().payload
    assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
      new String(wav.slice(8, 12), "US-ASCII") == "WAVE", "not a WAV header")

    val feats = Multimodal.decodeAudio(spark, media).collect().sortBy(_.doc_id)
    assert(feats.length == 16) // ids ≡ 1 (mod 3) in [0, 48)
    feats.foreach { f =>
      assert(f.sample_rate == 8000 + (f.doc_id % 8).toInt * 1000, s"$f")
      assert(f.channels == 1 + (f.doc_id % 2).toInt, s"$f")
      assert(f.frames == 200 + (f.doc_id % 100).toInt, s"$f")
      // canonical WAV: 44-byte header + 16-bit PCM frames
      assert(f.byte_len == 44 + f.frames * f.channels * 2, s"$f")
    }

    // an undecodable "audio" payload surfaces as -1s, not a crash
    val bad = Seq(Multimodal.MediaRow(98L, "audio", Array[Byte](1, 2, 3))).toDS()
    val badFeat = Multimodal.decodeAudio(spark, bad).head()
    assert(badFeat.sample_rate == -1 && badFeat.channels == -1 && badFeat.frames == -1)
  }

  test("real video decode demuxes the MJPEG AVI and decodes its frames") {
    import spark.implicits._
    val docs = (0L until 48L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withMediaPayload(docs, "doc_id", "text")
    // video payloads are genuine RIFF/AVI containers
    val avi = media.filter(_.media_type == "video").head().payload
    assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
      new String(avi.slice(8, 12), "US-ASCII") == "AVI ", "not an AVI header")

    val feats = Multimodal.decodeVideo(spark, media).collect().sortBy(_.doc_id)
    assert(feats.length == 16) // ids ≡ 2 (mod 3) in [0, 48)
    feats.foreach { f =>
      assert(f.width == 16 + (f.doc_id % 8).toInt * 2, s"$f")
      assert(f.height == 16 + (f.doc_id % 6).toInt * 2, s"$f")
      assert(f.frames == 2 + (f.doc_id % 5).toInt, s"$f")
      assert(f.fps == 5 + (f.doc_id % 5).toInt, s"$f")
    }

    // the sampler's frames are REAL JPEGs with the container's dims
    val sampled = Multimodal.frameSampleVideo(spark, media, everyMs = 1L)
      .collect().groupBy(_.doc_id)
    assert(sampled.keySet == feats.map(_.doc_id).toSet)
    sampled.foreach { case (id, fs) =>
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length),
        s"doc $id: frame indices not dense")
      assert(fs.length == 2 + (id % 5).toInt, s"doc $id: everyMs=1 must keep all frames")
      fs.foreach { fr =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fr.payload))
        assert(img != null && img.getWidth == 16 + (id % 8).toInt * 2, s"doc $id")
      }
    }
    // sampling at a coarse interval keeps strictly fewer frames (fps
    // ≥ 5 ⇒ frame step ≤ 200 ms < 1 s) but always frame 0
    val coarse = Multimodal.frameSampleVideo(spark, media, everyMs = 100000L).collect()
    assert(coarse.length == 16 && coarse.forall(_.frame_idx == 0))

    // an undecodable "video" payload surfaces as -1s, not a crash
    val bad = Seq(Multimodal.MediaRow(98L, "video", Array[Byte](1, 2, 3))).toDS()
    val badFeat = Multimodal.decodeVideo(spark, bad).head()
    assert(badFeat.width == -1 && badFeat.frames == -1 && badFeat.fps == -1)
  }

  test("real image resize scales to fit and re-encodes a decodable PNG") {
    import spark.implicits._
    val docs = (0L until 30L by 3).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val media = Multimodal.withMediaPayload(docs, "doc_id", "text")
    val resized = Multimodal.resizeImages(spark, media, 64, 32).collect()
    assert(resized.length == 10)
    resized.foreach { r =>
      assert(r.width <= 64 && r.height <= 32, r.toString)
      assert(r.width == 64 || r.height == 32, "scale-to-fit must touch one target edge")
      // output is itself a real PNG with the claimed dimensions
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth == r.width && img.getHeight == r.height)
    }
  }

  test("byte-histogram featurizer emits unit embeddings that feed the ANN operators") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = (0L until 30L).map(i => (i, s"media payload $i " * (i.toInt + 1)))
      .toDF("doc_id", "text")
    val media = Multimodal.withBinaryPayload(docs, "doc_id", "text")
      .as[Multimodal.MediaRow]
    val emb = Multimodal.byteHistogramFeatures(spark, media, dim = 16)
    val rows = emb.collect()
    assert(rows.length == 30)
    rows.foreach { e =>
      assert(e.embedding.length == 16)
      val norm = math.sqrt(e.embedding.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5, s"not unit-norm: $norm")
    }
    // deterministic
    assert(Multimodal.byteHistogramFeatures(spark, media, dim = 16).collect()
      .sortBy(_.doc_id).map(_.embedding.toSeq).toSeq ==
      rows.sortBy(_.doc_id).map(_.embedding.toSeq).toSeq)
    // composes with the similarity operators end-to-end
    val df = emb.toDF()
    val topk = graft.operators.Similarity.bruteForceTopK(
      df.filter(col("doc_id") < 3), df, "doc_id", "embedding", k = 5)
    assert(topk.count() == 15)
  }

  test("repetitionStats: hand-computed gram masses on degenerate and mixed docs") {
    import spark.implicits._
    val df = TextAnalysis.repetitionStats(Seq(
      (1L, "a a a a a"),
      // one repeated 5-gram covering the whole doc
      (2L, "x y z w v x y z w v"),
      (3L, "all distinct words here now"),
      (4L, "tiny doc"),
      (5L, "")
    ).toDF("doc_id", "text"), "doc_id", "text")
    val m = df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // doc1: denom=5; top 2-gram "a a" c=4 mass=4*2=8 -> 1.6;
    // top 3-gram "a a a" c=3 mass=3*3=9 -> 1.8; lone 5-gram c=1 -> 0
    assert(m(1L) == ((5L, 1.6, 1.8, 0.0)))
    // doc2: denom=10; "x y z w v" c=2 mass=2*5=10 -> dup5 1.0
    assert(m(2L)._1 == 10L && m(2L)._4 == 1.0)
    // doc3: all grams unique -> top masses are single occurrences;
    // denom = 23 token chars; top2 = "distinct words" mass 13
    assert(m(3L)._1 == 5L && m(3L)._4 == 0.0)
    // doc4: no 3- or 5-grams; top2 = "tiny doc" mass 7 / denom 7
    assert(m(4L) == ((2L, 1.0, 0.0, 0.0)))
    // doc5: one empty token, zero char mass -> all fracs 0
    assert(m(5L) == ((1L, 0.0, 0.0, 0.0)))
  }

  test("gopherQualityFilter: each rule bit fires on its crafted doc") {
    import spark.implicits._
    val good = (("the table holds a data value " * 9) + "the end").trim
    val df = TextAnalysis.gopherQualityFilter(Seq(
      (1L, good),
      (2L, "the a data value table short"),          // bit0: < 50 words
      (3L, ("supercalifragilistic " * 60).trim),     // bit1: mean len 20; bit4 too
      (4L, good + (" #" * 7)),                       // bit2: symbols (alpha stays >= 0.8)
      (5L, good.split(" ").take(15).mkString(" ") +
        (" 000" * 30)),                              // bit0+bit3: digit soup
      (6L, ("window merge batch sort filter " * 12).trim) // bit4: no stopwords
    ).toDF("doc_id", "text"), "doc_id", "text")
    val m = df.collect().map(r => r.getLong(0) ->
      (r.getAs[Long]("rule_bits"), r.getAs[Boolean]("keep"))).toMap
    assert(m(1L) == ((0L, true)))
    assert(m(2L) == ((1L, false)))
    assert(m(3L)._1 == (2L | 16L) && !m(3L)._2)
    assert(m(4L) == ((4L, false)))
    assert((m(5L)._1 & 8L) == 8L && (m(5L)._1 & 1L) == 1L && !m(5L)._2)
    assert(m(6L) == ((16L, false)))
  }

  test("tokenizerFertility: per-language integer sums and single-division ratios") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, when}
    val docs = Seq(
      // en: 2 docs, words 2 + 3 = 5, bytes 5 + 9 = 14
      (1L, "ab cd", "en"),        // synthetic tokens: 4
      (2L, "e fg hijk", "en"),    // 6 → en tokens 10
      (3L, "xy z", "de"),         // words 2, bytes 4, tokens 4
      (4L, null.asInstanceOf[String], "de"), // null text drops
      (5L, "w", null.asInstanceOf[String])   // null lang drops
    ).toDF("doc_id", "text", "lang")
    val rep = TextAnalysis.tokenizerFertility(docs, "doc_id", "text",
      "lang", tokenCount = when(col("doc_id") === 1L, 4L)
        .when(col("doc_id") === 2L, 6L).otherwise(4L))
    assert(rep.columns.toSeq == Seq("lang", "n_docs", "n_tokens",
      "n_words", "n_bytes", "fertility", "bytes_per_token"))
    val res = rep.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    assert(res("en") == ((2L, 10L, 5L, 14L, 2.0, 1.4)), res.toString)
    assert(res("de") == ((1L, 4L, 2L, 4L, 2.0, 1.0)), res.toString)
    assert(res.size == 2)
  }

  test("domainReport: hosts fold case/port, integer-unit quality mean, null url/text drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "http://A.com/x", "aa bb cc"),
      (2L, "https://a.com:443/y?z", "dd ee"),
      (3L, "http://b.org/p", "ff gg hh ii"),
      (4L, null.asInstanceOf[String], "drops"),
      (5L, "http://c.net/", null.asInstanceOf[String])
    ).toDF("doc_id", "url", "text")
    // per-doc quality from the pinned d9 blend (its own spec owns the
    // formula); this test owns the per-host aggregation arithmetic
    val q = docs.filter(col("text").isNotNull && col("url").isNotNull)
      .select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def avg4(ids: Long*): Double =
      math.round(ids.map(i => math.round(q(i) * 10000)).sum.toDouble /
        (ids.size * 10000.0) * 10000) / 10000.0
    val res = TextAnalysis.domainReport(docs, "doc_id", "url", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(res("a.com") == ((2L, 5L, 13L, avg4(1L, 2L))), res.toString)
    assert(res("b.org") == ((1L, 4L, 11L, avg4(3L))), res.toString)
    assert(res.size == 2)
  }

  test("langIdConfusion: cells count docs, share is per-label, misrouted docs land off-diagonal") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // marker words route predictions (langMarkers: en = the/a/fast,
    // de = merge/sort/batch). Doc 3 is labeled en but reads like the
    // de marker set — the off-diagonal cell the matrix exists to
    // expose. Doc 4's null lang drops.
    val docs = Seq(
      (1L, "the fast report on the table", "en"),
      (2L, "a fast plan", "en"),
      (3L, "merge sort batch runs", "en"),
      (5L, "merge sort pipeline", "de"),
      (4L, "the x", null.asInstanceOf[String])
    ).toDF("doc_id", "text", "lang")
    val res = TextAnalysis.langIdConfusion(docs, "doc_id", "text", "lang")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(res(("en", "en")) == ((2L, 0.6667)), res.toString)
    assert(res(("en", "de")) == ((1L, 0.3333)), res.toString)
    assert(res(("de", "de")) == ((1L, 1.0)), res.toString)
    assert(res.size == 3)
  }
}
