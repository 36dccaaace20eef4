package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class OperatorSpec extends SparkSuite {

  test("dedup_minhash_lsh finds every planted near-duplicate") {
    val pairs = Dedup.minhashLsh(spark, sf)
      .where(col("doc_b") >= 1000000L).collect()
    // plants are doc_id%10==0 with 6 words dropped → high Jaccard;
    // every plant must be caught alongside its original
    val caught = pairs.map(r => r.getLong(1) - 1000000L).toSet
    val planted = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 10 === 0).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(planted.subsetOf(caught ++ pairs.map(_.getLong(0))))
    assert(pairs.forall(_.getLong(2) >= 500L))
  }

  test("dedup_simhash: banding output EQUALS brute-force all-pairs at Hamming <= 8") {
    // The 10-block pair banding guarantees (pigeonhole) that every pair
    // within Hamming 8 shares a bucket, so after exact verification the
    // operator must return EXACTLY the brute-force all-pairs result —
    // a complete-recall check far stronger than spot-checking plants.
    // (Plants whose true signature distance exceeds 8 — dropping 3
    // tokens from a short doc can flip 9-16 bits — are outside the
    // operator's advertised radius and correctly absent from BOTH.)
    val pairs = Dedup.simhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Dedup.simhashSigs(
        Dedup.corpusWithPlants(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ida, sa) <- sigs; (idb, sb) <- sigs if ida < idb
      hd = java.lang.Long.bitCount(sa ^ sb).toLong if hd <= 8L
    } yield (ida, idb, hd)).toSet
    assert(pairs === brute)
    // and the radius still catches the bulk of the planted variants
    val plantPairs = pairs.filter(p => p._2 === p._1 + 1000000L)
    assert(plantPairs.size >= 40)
  }

  test("simhashPairs finds a NON-planted near-dup via signature-chunk banding") {
    import spark.implicits._
    // two docs with arbitrary unrelated ids, one extra token apart —
    // no id-derived blocking could pair 7 with 424242
    val words = (1 to 60).map(i => s"tok$i")
    val near = Seq((7L, words), (424242L, words :+ "extra"))
    val noise = (1 to 30).map(i => (100L + i, (1 to 60).map(j => s"w${i}_$j")))
    val docs = (near ++ noise).toDF("doc_id", "toks")
    val pairs = Dedup.simhashPairs(docs, 8).collect()
    assert(pairs.exists(r => r.getLong(0) == 7L && r.getLong(1) == 424242L))
  }

  test("dedup_embedding_lsh: exact copies found without any label column") {
    val pairs = Dedup.embeddingNearDupLsh(spark, sf).collect()
    val copies = pairs.filter(r => r.getLong(1) === r.getLong(0) + 1000000L)
    // identical vectors always share every hyperplane sign → 100% recall
    assert(copies.length === 100)
    assert(copies.forall(_.getLong(2) === 1000000L))
  }

  test("ngram df filter: default threshold is a no-op on this corpus; low thresholds prune") {
    val def_ = Dedup.ngramJaccard(spark, sf).collect().toSeq
    val unfiltered = Dedup.ngramJaccard(spark, sf, Int.MaxValue).collect().toSeq
    assert(def_ === unfiltered) // oracle safety: nothing dropped at maxDf=128
    val all0 = Dedup.ngramJaccard(spark, sf, 0).collect()
    assert(all0.isEmpty) // maxDf=0 drops every shingle → no candidates
  }

  test("dedup_embedding: exact copies rank at cosine 1.0") {
    val pairs = Dedup.embeddingNearDup(spark, sf).collect()
    val copies = pairs.filter(r => r.getLong(1) === r.getLong(0) + 1000000L)
    assert(copies.length === 100)
    assert(copies.forall(_.getLong(2) === 1000000L))
  }

  test("ann brute-force topk: 5 ranked neighbors per query, sims descending") {
    val rows = Similarity.bruteforceTopk(spark, sf).collect()
    assert(rows.length === 50) // 10 queries × 5
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      val sims = byRank.map(_.getLong(2)).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("ann lsh topk: <=5 ranked candidates per query, sims descending") {
    val rows = Similarity.lshTopk(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      val byRank = rs.sortBy(_.getLong(3))
      assert(byRank.map(_.getLong(3)).toSeq === (1L to rs.length).toSeq)
      val sims = byRank.map(_.getLong(2)).toSeq
      assert(sims === sims.sorted.reverse)
    }
  }

  test("text fingerprint is deterministic and order-sensitive") {
    val a = TextAnalysis.fingerprint(spark, sf).collect()
    val b = TextAnalysis.fingerprint(spark, sf).collect()
    assert(a.map(_.getLong(1)).toSeq === b.map(_.getLong(1)).toSeq)
    // rolling hash over different docs should essentially never collide
    assert(a.map(_.getLong(1)).distinct.length > a.length / 2)
  }

  test("langid picks the argmax lexicon score") {
    val rows = TextAnalysis.langId(spark, sf).collect()
    assert(rows.length === 500)
    assert(rows.forall(r => Set("de", "en", "es", "fr", "zh")(r.getString(2))))
  }

  test("multimodal decode emits one feature row per doc with stub dims") {
    val rows = Multimodal.decodeFeatures(spark, sf).collect()
    assert(rows.length === 500)
    assert(rows.forall { r =>
      val w = r.getInt(1); val h = r.getInt(2); val f = r.getInt(3)
      w >= 64 && w < 128 && h >= 64 && h < 128 && f >= 1 && f <= 8
    })
  }

  test("PPM blobs take the REAL codec path: exact dims, pixel checksum, box-filter thumbnail") {
    import spark.implicits._
    def ppm(w: Int, h: Int, seed: Int): (Array[Byte], Array[Byte]) = {
      val px = Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 7) % 256).toByte)
      val header = s"P6\n# synthetic test image $seed\n$w $h\n255\n".getBytes("US-ASCII")
      (header ++ px, px)
    }
    val imgs = Seq((1L, ppm(64, 48, 1)), (2L, ppm(17, 9, 2)), (3L, ppm(32, 32, 3)))
    val df = imgs.map { case (id, (blob, _)) => (id, blob) }.toDF("doc_id", "blob")

    val rows = Multimodal.decodeFeaturesOf(df).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ===
      Seq((1L, 64, 48, 1), (2L, 17, 9, 1), (3L, 32, 32, 1)))
    // the feature checksum covers the DECODED pixels, not the file bytes
    val wantCs = imgs.map { case (id, (_, px)) => id -> Multimodal.checksumOf(px) }.toMap
    rows.foreach(r => assert(r.getLong(4) === wantCs(r.getLong(0))))

    // resize: REAL box-filter average pool, pinned to a driver recompute
    val thumbs = Multimodal.resizeOf(df, 8, 8).collect()
    val wantThumb = imgs.map { case (id, (_, px)) =>
      val (w, h) = if (id == 1L) (64, 48) else if (id == 2L) (17, 9) else (32, 32)
      id -> Multimodal.checksumOf(Multimodal.averagePool(w, h, px, 8, 8))
    }.toMap
    thumbs.foreach(r => assert(r.getLong(3) === wantThumb(r.getLong(0))))
    // pooling a constant-color image is exact: every thumb pixel = that color
    val flat = Array.fill(10 * 10 * 3)(200.toByte)
    assert(Multimodal.averagePool(10, 10, flat, 4, 4).forall(_ == 200.toByte))

    // a truncated/garbage "P6" blob falls back to the stub, never throws
    val junk = Seq((9L, "P6 not really an image".getBytes("US-ASCII"))).toDF("doc_id", "blob")
    val j = Multimodal.decodeFeaturesOf(junk).collect()
    assert(j.length === 1 && j.head.getInt(1) >= 64 && j.head.getInt(1) < 128)
  }

  test("BMP blobs take the REAL codec path: BGR un-swizzle, bottom-up rows, padding") {
    import spark.implicits._
    // hand-build a 24-bit BMP: 3×2 image, rows padded to 12 bytes (3*3=9 → 12)
    def bmp(w: Int, h: Int, rgb: Array[Byte], topDown: Boolean): Array[Byte] = {
      val rowBytes = (w * 3 + 3) & ~3
      val dataSize = rowBytes * h
      val out = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
        .putInt(0).putInt(54) // reserved, pixel-data offset
      out.putInt(40).putInt(w).putInt(if (topDown) -h else h)
        .putShort(1).putShort(24).putInt(0).putInt(dataSize)
        .putInt(2835).putInt(2835).putInt(0).putInt(0)
      for (row <- 0 until h) {
        val srcRow = if (topDown) row else h - 1 - row
        for (x <- 0 until w) {
          val s = (srcRow * w + x) * 3
          out.put(rgb(s + 2)).put(rgb(s + 1)).put(rgb(s)) // RGB → BGR
        }
        for (_ <- w * 3 until rowBytes) out.put(0.toByte)
      }
      out.array()
    }
    val rgb = Array.tabulate(3 * 2 * 3)(i => (i * 13 + 5).toByte)
    for (topDown <- Seq(false, true)) {
      val decoded = Multimodal.decodeBmp(bmp(3, 2, rgb, topDown))
      assert(decoded.isDefined, s"topDown=$topDown BMP must decode")
      val (w, h, px) = decoded.get
      assert((w, h) === (3, 2))
      assert(px.toSeq === rgb.toSeq,
        s"topDown=$topDown round-trip must reproduce the row-major RGB plane")
    }
    // the full pipeline routes BMP through the real path: checksum of
    // DECODED pixels, same as an identical-content PPM
    val asBmp = Seq((1L, bmp(3, 2, rgb, topDown = false))).toDF("doc_id", "blob")
    val row = Multimodal.decodeFeaturesOf(asBmp).collect().head
    assert((row.getInt(1), row.getInt(2), row.getLong(4)) ===
      (3, 2, Multimodal.checksumOf(rgb)))
    // 8-bit/paletted/compressed BMPs are out of scope → stub, not throw
    val gray8 = bmp(3, 2, rgb, topDown = false)
    gray8(28) = 8 // bit-count 8
    assert(Multimodal.decodeBmp(gray8).isEmpty)
  }

  test("WAV blobs take the REAL audio codec path: PCM parse, mono mix, RMS/peak") {
    import spark.implicits._
    // one shared hand-rolled encoder (TestWav): optional extra chunk
    // before fmt/data proves the chunk walk skips unknown ids
    import TestWav.wav

    // 16-bit stereo: mono mix is the per-frame integer mean
    val stereo = wav(16000, 16, 2,
      Seq(Seq(1000, 3000), Seq(-2000, -4000), Seq(0, 0), Seq(500, 501)))
    val Some((ch, rate, mono)) = Multimodal.decodeWav(stereo)
    assert((ch, rate) === (2, 16000))
    assert(mono.toSeq === Seq(2000, -3000, 0, 500))

    // 8-bit mono survives the unsigned-midpoint shift (÷256 precision)
    val Some((_, _, m8)) = Multimodal.decodeWav(
      wav(8000, 8, 1, Seq(Seq(1024), Seq(-2048), Seq(0))))
    assert(m8.toSeq === Seq(1024, -2048, 0))

    // unknown chunks are skipped, not fatal
    assert(Multimodal.decodeWav(
      wav(8000, 16, 1, Seq(Seq(7)), extraChunk = true)).map(_._3.toSeq)
      === Some(Seq(7)))

    // full pipeline: duration/RMS/peak from the DECODED samples
    val clip = wav(8000, 16, 1,
      Seq.fill(4000)(Seq(3000)) ++ Seq.fill(4000)(Seq(-4000)))
    val row = Multimodal.audioFeaturesOf(
      Seq((1L, clip)).toDF("doc_id", "blob")).collect().head
    assert((row.getInt(1), row.getInt(2), row.getLong(3), row.getLong(4)) ===
      (1, 8000, 8000L, 1000L)) // 8000 samples at 8 kHz = 1000 ms
    val wantRms = math.sqrt((4000.0 * 3000 * 3000 + 4000.0 * 4000 * 4000) / 8000).toLong
    assert((row.getLong(5), row.getLong(6)) === (wantRms, 4000L))

    // truncated data chunk / float PCM / non-WAV → stub, never throws
    val cut = java.util.Arrays.copyOfRange(stereo, 0, stereo.length - 3)
    assert(Multimodal.decodeWav(cut).isEmpty)
    val floatFmt = wav(8000, 16, 1, Seq(Seq(1)))
    floatFmt(20) = 3 // audioFormat = IEEE float
    assert(Multimodal.decodeWav(floatFmt).isEmpty)
    val stub = Multimodal.audioFeaturesOf(
      Seq((9L, "not audio".getBytes("US-ASCII"))).toDF("doc_id", "blob"))
      .collect().head
    assert(stub.getInt(2) >= 8000 && stub.getLong(3) >= 1000L)
  }

  test("audio resampling: integer linear interpolation, exact on crafted clips") {
    import spark.implicits._
    // identity: same rate returns the clip untouched
    val clip = Array(100, -200, 300, -400)
    assert(Multimodal.resampleLinear(8000, 8000, clip) eq clip)
    // 2× upsample interleaves exact midpoints (last sample clamps)
    assert(Multimodal.resampleLinear(8000, 16000, Array(100, 300)).toSeq ===
      Seq(100, 200, 300, 300))
    // 2:1 downsample lands on every other sample exactly (frac = 0)
    assert(Multimodal.resampleLinear(16000, 8000, Array(1, 2, 3, 4, 5, 6)).toSeq ===
      Seq(1, 3, 5))
    // constant clips stay constant through any rational rate change
    assert(Multimodal.resampleLinear(44100, 16000, Array.fill(441)(123))
      .forall(_ === 123))

    // full pipeline: real WAV resamples, stub blob passes through shape
    import TestWav.wav16
    val df = Seq(
      (1L, wav16(8000, Seq(100, 300))),
      (2L, "not audio".getBytes("US-ASCII"))).toDF("doc_id", "blob")
    val rows = Multimodal.audioResampleOf(df).collect()
    val real = rows.find(_.getLong(0) == 1L).get
    assert((real.getInt(1), real.getLong(2), real.getInt(3), real.getLong(4)) ===
      (8000, 2L, 16000, 4L))
    // checksum is over the RESAMPLED signal — recompute it driver-side
    val want = Seq(100, 200, 300, 300)
      .foldLeft(1125899906842597L)((cs, v) => cs * 31 + v)
    assert(real.getLong(5) === want)
    val stub = rows.find(_.getLong(0) == 2L).get
    assert(stub.getLong(4) === stub.getLong(2) * 16000L / stub.getInt(1))
  }

  test("audio segmentation: energy windows merge into utterances, silence splits them") {
    import spark.implicits._
    import TestWav.wav16
    // 8 kHz: 160-sample windows = 20 ms. 500 ms loud, 500 ms silence,
    // 250 ms loud → utterances [0,500) and [1000,1250) ms
    val clip = Seq.fill(4000)(8000) ++ Seq.fill(4000)(0) ++ Seq.fill(2000)(8000)
    val segs = Multimodal.segmentVoiced(8000, clip.toArray)
    assert(segs.map(s => (s._1, s._2)) === Seq((0L, 500L), (1000L, 1250L)))
    // constant amplitude → mean window RMS is that amplitude
    assert(segs.forall(_._3 === 8000L))

    // RELATIVE threshold: a uniformly quiet clip is all voiced (one
    // utterance), not all silence — 10% of ITS OWN peak, not absolute
    val quiet = Multimodal.segmentVoiced(8000, Array.fill(1600)(50))
    assert(quiet.map(s => (s._1, s._2)) === Seq((0L, 200L)))
    // digital silence has no peak to be relative to → no utterances
    assert(Multimodal.segmentVoiced(8000, Array.fill(1600)(0)).isEmpty)

    // full pipeline over a real WAV + a stub blob in one frame
    val df = Seq(
      (1L, wav16(8000, clip)),
      (2L, "not audio at all".getBytes("US-ASCII"))).toDF("doc_id", "blob")
    val rows = Multimodal.audioSegmentsOf(df).collect()
    val real = rows.filter(_.getLong(0) == 1L)
    assert(real.map(r => (r.getInt(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq((0, 0L, 500L), (1, 1000L, 1250L)))
    val stub = rows.filter(_.getLong(0) == 2L)
    assert(stub.nonEmpty && stub.forall(r => r.getLong(3) > r.getLong(2)))
  }

  test("JPEG and PNG blobs take the REAL codec path via the JDK's ImageIO") {
    import spark.implicits._
    val w = 24; val h = 16
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7 + 11) % 256).toByte)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val s = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(s) & 0xff) << 16) |
        ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff))
    }
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = encode("png"); val jpg = encode("jpg")
    assert((png(1), png(2), png(3)) === ('P'.toByte, 'N'.toByte, 'G'.toByte))
    assert((jpg(0) & 0xff, jpg(1) & 0xff) === (0xff, 0xd8))

    // PNG is lossless: exact dims AND the exact RGB plane back
    val Some((pw, ph, ppx)) = Multimodal.decodeJavax(png)
    assert((pw, ph) === (w, h))
    assert(ppx.toSeq === rgb.toSeq, "PNG round-trip must be pixel-exact")

    // JPEG is lossy: exact dims, pixels within a small mean error
    val Some((jw, jh, jpx)) = Multimodal.decodeJavax(jpg)
    assert((jw, jh) === (w, h))
    val meanErr = jpx.indices.map(i => math.abs((jpx(i) & 0xff) - (rgb(i) & 0xff))).sum.toDouble / jpx.length
    assert(meanErr < 16.0, s"JPEG decode drifted too far: mean |err| = $meanErr")

    // the full pipeline routes both through the real path: dims from the
    // DECODED image, checksum over DECODED pixels (not the file bytes)
    val df = Seq((1L, png), (2L, jpg)).toDF("doc_id", "blob")
    val rows = Multimodal.decodeFeaturesOf(df).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ===
      Seq((1L, w, h, 1), (2L, w, h, 1)))
    assert(rows(0).getLong(4) === Multimodal.checksumOf(rgb))
    assert(rows(1).getLong(4) === Multimodal.checksumOf(jpx))

    // truncated JPEG falls back to the stub, never throws
    val cut = java.util.Arrays.copyOfRange(jpg, 0, jpg.length / 3)
    assert(Multimodal.decodeJavax(cut).isEmpty)
    val junkRows = Multimodal.decodeFeaturesOf(
      Seq((9L, cut)).toDF("doc_id", "blob")).collect()
    assert(junkRows.length === 1 && junkRows.head.getInt(1) >= 64)
  }

  test("a 67-byte dimension-bomb PNG stubs out instead of allocating gigabytes") {
    // IHDR claims 25000×25000 (1.9e9 px → ~7.5 GB of ARGB ints): the
    // header-only dims guard must reject it BEFORE ImageIO decodes —
    // an OutOfMemoryError inside the decode is uncatchable task death
    def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      val tb = tpe.getBytes("US-ASCII")
      crc.update(tb); crc.update(data)
      java.nio.ByteBuffer.allocate(12 + data.length)
        .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
        .array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(25000).putInt(25000)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val bomb = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IEND", Array.empty[Byte])
    val t0 = System.nanoTime()
    assert(Multimodal.decodeJavax(bomb).isEmpty)
    assert((System.nanoTime() - t0) < 5e9, "bomb rejection must be header-fast")
    // and the pipeline stubs it like any other undecodable blob
    import spark.implicits._
    val row = Multimodal.decodeFeaturesOf(
      Seq((1L, bomb)).toDF("doc_id", "blob")).collect().head
    assert(row.getInt(1) >= 64 && row.getInt(1) < 128)
  }

  test("adversarial headers: BMP width overflow and malformed Y4M params stub, never throw") {
    // BMP with w=0x55555556: w*3 overflows Int to 2, which used to
    // defeat the length check and crash the pixel loop with AIOOBE
    val bomb = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bomb.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(54)
      .putInt(40).putInt(0x55555556).putInt(1)
      .putShort(1).putShort(24).putInt(0).putInt(0)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    assert(Multimodal.decodeBmp(bomb.array()).isEmpty)
    // Y4M header params that used to throw NumberFormatException
    for (hdr <- Seq("YUV4MPEG2 W\n", "YUV4MPEG2 W5x H2\n",
        "YUV4MPEG2 W99999999999 H2\n"))
      assert(Multimodal.decodeY4m(hdr.getBytes("US-ASCII")).isEmpty, hdr)
  }

  test("phash invariance extends to PNG (exact) and JPEG (near) encodings") {
    val w = 16; val h = 16
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 31) % 256).toByte)
    val asPpm = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val s = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(s) & 0xff) << 16) |
        ((rgb(s + 1) & 0xff) << 8) | (rgb(s + 2) & 0xff))
    }
    def encode(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val ppmGray = Multimodal.grayPixels(asPpm)
    // PNG: lossless → the 8×8 gray plane is IDENTICAL to the PPM's
    assert(Multimodal.grayPixels(encode("png")).toSeq === ppmGray.toSeq)
    // JPEG: lossy → same image must land within a small aHash Hamming
    // distance (the whole point of a perceptual hash)
    val jpgGray = Multimodal.grayPixels(encode("jpg"))
    def hash(px: Array[Long]): Long = {
      val mean = px.sum / 64
      px.zipWithIndex.foldLeft(0L) { case (a, (p, i)) =>
        if (p >= mean) a | (1L << i) else a }
    }
    val dist = java.lang.Long.bitCount(hash(ppmGray) ^ hash(jpgGray))
    assert(dist <= 4, s"JPEG re-encode moved the aHash $dist bits")
  }

  test("phash pixels: identical content through PPM and BMP hashes identically") {
    // the aHash input must be codec-invariant: same pixels, same gray 8×8
    val w = 16; val h = 16
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 31) % 256).toByte)
    val asPpm = s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
    val rowBytes = (w * 3 + 3) & ~3
    val out = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putInt(0).putInt(54).putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24).putInt(0).putInt(rowBytes * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (row <- 0 until h) {
      val srcRow = h - 1 - row
      for (x <- 0 until w) {
        val s = (srcRow * w + x) * 3
        out.put(rgb(s + 2)).put(rgb(s + 1)).put(rgb(s))
      }
      for (_ <- w * 3 until rowBytes) out.put(0.toByte)
    }
    val pPx = Multimodal.grayPixels(asPpm)
    val bPx = Multimodal.grayPixels(out.array())
    assert(pPx.toSeq === bPx.toSeq)
    // and real gray pixels, not the stub's synthetic ones
    assert(pPx.toSeq !== Multimodal.grayPixels("not an image".getBytes).toSeq)
  }

  test("Y4M video blobs: real container parse, per-frame luma features, stub fallback") {
    import spark.implicits._
    // 4×2 C420 video, 3 frames; luma = frame index pattern, chroma = 128s
    val w = 4; val h = 2
    val lumas = (0 until 3).map(f => Array.tabulate(w * h)(i => ((f * 40 + i * 10) % 256).toByte))
    val chroma = Array.fill((w / 2) * (h / 2) * 2)(128.toByte)
    val blob = s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII") ++
      lumas.flatMap(l => "FRAME\n".getBytes("US-ASCII") ++ l ++ chroma)
    val parsed = Multimodal.decodeY4m(blob)
    assert(parsed.isDefined)
    val (pw, ph, frames) = parsed.get
    assert((pw, ph, frames.length) === (w, h, 3))
    assert(frames.map(_.toSeq) === lumas.map(_.toSeq))

    // pipeline: one row per frame, REAL mean luma + luma checksum
    val df = Seq((7L, blob)).toDF("doc_id", "blob")
    val rows = Multimodal.frameSampleOf(df).collect()
    assert(rows.length === 3)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === 7L && r.getInt(1) === i)
      assert(r.getLong(2) === Multimodal.checksumOf(lumas(i)))
      val want = lumas(i).map(_ & 0xff).map(_.toLong).sum / (w * h)
      assert(r.getLong(3) === want, s"frame $i mean luma")
    }
    // mono chroma: frame = just the luma plane
    val mono = s"YUV4MPEG2 W$w H$h Cmono\n".getBytes("US-ASCII") ++
      "FRAME\n".getBytes("US-ASCII") ++ lumas(0)
    assert(Multimodal.decodeY4m(mono).get._3.length === 1)
    // a truncated stream (frame shorter than the advertised planes)
    // falls back to the stub instead of reading garbage
    val truncated = blob.dropRight(3)
    assert(Multimodal.decodeY4m(truncated).isEmpty)
    val stubRows = Multimodal.frameSampleOf(
      Seq((8L, truncated)).toDF("doc_id", "blob")).collect()
    assert(stubRows.nonEmpty && stubRows.forall(_.getLong(3) === -1L))
  }

  test("mm_image_histogram: exact bins for planted images, zeroed stub rows") {
    import spark.implicits._
    // 2×2 PPM: lumas 0 (bin 0), 255 (bin 15), 128 (bin 8), 16 (bin 1)
    val ppm = ("P6\n2 2\n255\n").getBytes("US-ASCII") ++ Array[Byte](
      0, 0, 0, -1, -1, -1,
      -128, -128, -128, 16, 16, 16)
    val df = Seq((1L, ppm), (2L, "not an image".getBytes("US-ASCII")))
      .toDF("doc_id", "blob")
    val rows = Multimodal.imageHistogramOf(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(rows.length === 32) // fixed 16 rows per blob
    val real = rows.filter(_._1 == 1L)
    assert(real.forall(_._4 == "real"))
    assert(real.map(_._3).sum === 4L)
    val byBin = real.map(r => r._2 -> r._3).toMap
    assert(byBin(0) === 1L && byBin(15) === 1L && byBin(8) === 1L &&
      byBin(1) === 1L)
    val stub = rows.filter(_._1 == 2L)
    assert(stub.forall(r => r._4 == "stub" && r._3 == 0L))
  }

  test("mm_keyframes: hard cuts flagged, gradual fades and stubs not") {
    import spark.implicits._
    val w = 4; val h = 2
    def y4m(lumaMeans: Seq[Int]): Array[Byte] = {
      val chroma = Array.fill((w / 2) * (h / 2) * 2)(128.toByte)
      s"YUV4MPEG2 W$w H$h C420\n".getBytes("US-ASCII") ++
        lumaMeans.flatMap(m =>
          "FRAME\n".getBytes("US-ASCII") ++ Array.fill(w * h)(m.toByte) ++ chroma)
    }
    // doc 1: dark, dark, bright, bright, dark → cuts at frames 2 and 4
    // doc 2: gradual ramp +10/frame → no cut, only the opening frame
    // doc 3: not a video → stub, only the opening frame
    val df = Seq(
      (1L, y4m(Seq(16, 16, 200, 200, 30))),
      (2L, y4m(Seq(60, 70, 80, 90, 100))),
      (3L, "definitely not video".getBytes("US-ASCII"))).toDF("doc_id", "blob")
    val rows = Multimodal.keyframesOf(df).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(4)))
    assert(rows.toSet === Set(
      (1L, 0, "first"), (1L, 2, "cut"), (1L, 4, "cut"),
      (2L, 0, "first"), (3L, 0, "first")))
    // deltas carry the signed luma jump
    val cut2 = Multimodal.keyframesOf(df).collect()
      .find(r => r.getLong(0) == 1L && r.getInt(1) == 4).get
    assert(cut2.getLong(3) < 0) // bright→dark is a negative jump
    // threshold is a live plan literal: raising it suppresses the cuts
    val strict = Multimodal.keyframesOf(df, threshold = 250L).collect()
    assert(strict.forall(_.getString(4) == "first"))
  }

  test("dedup_winnowing EQUALS direct fingerprint-set intersection; plants found") {
    // ground truth straight from the selected fingerprints: pairwise
    // |rare-fp intersection| >= 2 (rare = df <= 128 — MOSS-style: runs
    // ubiquitous across the corpus don't count as evidence)
    val fps = Dedup.winnowFps(spark, sf, 4, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val df = fps.groupBy(_._2).view.mapValues(_.length).toMap
    val byDoc = fps.filter(p => df(p._2) <= 128)
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val docs = byDoc.keys.toSeq.sorted
    val want = (for {
      (a, ia) <- docs.zipWithIndex; b <- docs.drop(ia + 1)
      shared = (byDoc(a) & byDoc(b)).size if shared >= 2
    } yield (a, b, shared.toLong)).toSet
    val got = Dedup.winnowing(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
    // the prefix-copy plants share their whole run: found unless ALL
    // their fingerprints are corpus-ubiquitous (MOSS-correct to skip);
    // on this corpus that's at most a couple of template-only docs
    val planted = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 10 === 0).count()
    val foundPlants = got.count(p => p._2 == p._1 + 1000000L)
    assert(foundPlants * 10 >= planted * 9,
      s"plant recall too low: $foundPlants/$planted")
  }

  test("mm_phash_dedup: every planted mirrored-corner variant found within Hamming <= 4") {
    val pairs = Multimodal.phashDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 10 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    // reversing 4 pixels preserves the mean → at most 4 aHash bits flip
    // → every plant must pair with its original, at distance <= 4
    val found = pairs.collect {
      case (a, b, h) if b == a + 1000000L && planted(a) => (a, h)
    }
    assert(found.map(_._1).toSet === planted)
    assert(found.forall(_._2 <= 4L))
    // no pair beyond the advertised radius survives verification
    assert(pairs.forall(_._3 <= 8L))
  }

  test("ivf ann: valid ranks, neighbors drawn from probed cells, sane recall") {
    val ivf = Similarity.ivfTopk(spark, sf).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(4)).sorted.toSeq === (1L to rs.length).toSeq)
    }
    // probing all cells would be exhaustive — with nProbe=3 of 10 cells,
    // the approximate result must still overlap the exact top-5 somewhere
    val exact = Similarity.bruteforceTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx.exists(exact.contains) || exact.isEmpty)
  }

  test("q_quantiles_approx tracks the exact percentiles within the sketch error bound") {
    // gated output: (l_returnflag, n, p50_ok, p90_ok) — every ok bit 1
    val gated = Analytics.qQuantilesApprox(spark, sf).collect()
    assert(gated.nonEmpty)
    gated.foreach { r =>
      assert(r.getLong(2) === 1L && r.getLong(3) === 1L,
        s"${r.getString(0)}: accuracy bit 0")
    }
    // raw sketch values recomputed here; tight 2%-band vs exact
    val exact = Analytics.qQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val approx = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(approx_percentile(col("l_extendedprice"),
        array(lit(0.5), lit(0.9)), lit(10000)).as("pcts"))
      .select(col("l_returnflag"),
        round(element_at(col("pcts"), 1) * 100).cast("long"),
        round(element_at(col("pcts"), 2) * 100).cast("long"))
      .collect()
    assert(approx.length === exact.size)
    approx.foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      // accuracy 10000 → rank error <= 1e-4; on this price distribution
      // that is well under 2% in value terms
      assert(math.abs(r.getLong(1) - p50) <= math.max(p50 / 50, 1L),
        s"p50 off for ${r.getString(0)}: got ${r.getLong(1)}, exact $p50")
      assert(math.abs(r.getLong(2) - p90) <= math.max(p90 / 50, 1L),
        s"p90 off for ${r.getString(0)}: got ${r.getLong(2)}, exact $p90")
    }
  }

  test("ivf-kmeans ann: valid ranks and recall comparable to the probed fraction") {
    val got = Similarity.ivfKmeansTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    // ranks 1..k per query, no self-matches
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted === (1L to rows.size.toLong))
      assert(rows.forall(_._2 != q))
    }
    // recall@5 vs exact brute force: probing 3 of 8 trained cells must
    // recover a clear majority of true neighbors (near-dup vectors land
    // in the same cell — that's the point of training the quantizer)
    val exact = Similarity.bruteforceTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = exact.keys.toSeq.map(q =>
      (approx.getOrElse(q, Set.empty) & exact(q)).size).sum
    val total = exact.values.map(_.size).sum
    assert(hits * 10 >= total * 5, s"recall@5 too low: $hits/$total")
  }

  test("knn label vote emits one prediction per query") {
    val rows = Similarity.knnLabelVote(spark, sf).collect()
    assert(rows.length === 50)
    assert(rows.forall(r => r.getLong(3) == 0L || r.getLong(3) == 1L))
  }

  test("decontaminate flags the exact-duplicate partner of a benchmark doc") {
    // an exact dup of a benchmark doc (doc_id%50==0) shares EVERY
    // window → must be flagged with hits = its full window count
    val dups = Dedup.exact(spark, sf).where(col("n_dups") >= 2).collect()
    val byHash = graft.Tables.documents(spark, sf)
      .select(md5(col("text")).as("h"), col("doc_id")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    val benchDupPartner = dups.iterator.map(r => byHash(r.getString(0)))
      .flatMap(ids => ids.filter(i => i % 50 != 0 && ids.exists(_ % 50 == 0)).headOption)
      .toSeq.headOption
    val flagged = TextAnalysis.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    benchDupPartner.foreach(p => assert(flagged.contains(p), s"dup partner $p not flagged"))
    // no benchmark doc ever appears in the output
    assert(flagged.keySet.forall(_ % 50 != 0))
  }

  test("fuzzy decontamination finds the paraphrased benchmark plants") {
    // each plant (doc_id + corpus-derived offset, last 3 words dropped)
    // is a paraphrase of exactly one benchmark doc — it must be flagged
    // with its source as the best match, and no benchmark doc may
    // appear on the corpus side of the report
    val off = TextAnalysis.plantOffset(graft.Tables.documents(spark, sf))
    val flagged = TextAnalysis.decontaminateFuzzy(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val benchIds = graft.Tables.documents(spark, sf)
      .where(col("doc_id") % 50 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0))
    assert(benchIds.nonEmpty)
    val plantsFlagged = benchIds.filter(b => flagged.contains(b + off))
    // MinHash est ≥ 700‰ at true jaccard ≈ 0.85: expect nearly all
    assert(plantsFlagged.length * 10 >= benchIds.length * 8,
      s"only ${plantsFlagged.length}/${benchIds.length} plants flagged")
    // benchmark docs can themselves be near-identical (template
    // corpus), so a plant's best match may be a TWIN of its source —
    // require best to be a benchmark doc at plausible similarity, that
    // each plant's match set INCLUDES its source (the source shares
    // ≥ the plant's every shingle, so if anything passed the gate the
    // source did — n_bench_matches must cover it), and that at least
    // one plant recovers its source exactly
    plantsFlagged.foreach { b =>
      val (nMatches, best, estPm) = flagged(b + off)
      assert(best % 50 === 0 && best < off,
        s"plant ${b + off}: best match $best is not a benchmark doc")
      assert(estPm >= 700 && estPm <= 1000)
      assert(nMatches >= 1)
    }
    assert(plantsFlagged.exists(b => flagged(b + off)._2 === b),
      "no plant recovered its own source benchmark doc")
    assert(flagged.keySet.forall(id => id % 50 != 0 || id >= off),
      "a benchmark doc leaked onto the corpus side")
  }

  test("repetition: duplicate-trigram and top-token rates are sane and bounded") {
    val rows = TextAnalysis.repetition(spark, sf).collect()
    assert(rows.length === graft.Tables.documents(spark, sf).count())
    assert(rows.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 1000))
    assert(rows.forall(r => r.getLong(3) >= 0 && r.getLong(3) <= 1000))
    // the synthetic small-vocab corpus must show SOME token repetition
    assert(rows.exists(_.getLong(3) > 100))
  }

  test("gopher rules: each rule fires on its planted doc, in priority order") {
    import spark.implicits._
    val clean = (Seq("the", "of") ++
      (0 until 58).map(i => s"word${i}xx")).mkString(" ")
    val docs = Seq(
      (1L, "just ten small words here nothing more to say now"), // word_count
      (2L, Seq.fill(60)("ab").mkString(" ")), // mean_word_length (2000 pm)
      (3L, (0 until 60).map(i => (100 + i).toString).mkString(" ")), // alpha_words
      (4L, (0 until 60).map(i => s"word${i}xx").mkString(" ")), // stop_words
      (5L, Seq.fill(20)("the wolf runs over the hill").mkString(" ")), // repetition
      (6L, clean)) // passes everything
      .toDF("doc_id", "text")
    val got = TextAnalysis.gopherRulesFrom(docs).collect()
      .map(r => (r.getLong(0), r.getString(6), r.getLong(7))).toSeq
    assert(got === Seq(
      (1L, "word_count", 0L), (2L, "mean_word_length", 0L),
      (3L, "alpha_words", 0L), (4L, "stop_words", 0L),
      (5L, "repetition", 0L), (6L, "", 1L)))
    // rule ORDER: doc 2's "ab ab ab…" also trips repetition and
    // stop_words, but mean_word_length is the FIRST rule that fails
    val d2 = TextAnalysis.gopherRulesFrom(docs).where(col("doc_id") === 2L)
      .collect().head
    assert(d2.getLong(5) > 300L, "doc 2 should also be repetitive")
    assert(d2.getString(6) === "mean_word_length")
    // the real corpus splits on the rules rather than one verdict
    val corpus = TextAnalysis.gopherRules(spark, sf).collect()
    assert(corpus.map(_.getLong(7)).toSet === Set(0L, 1L),
      "sf corpus should contain both kept and dropped docs")
  }

  test("incremental dedup matches an independently computed hash lookup") {
    val rows = Dedup.incremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val existing = docs.filter(_._1 % 5 != 4).groupBy(_._2)
      .view.mapValues(_.map(_._1).min).toMap
    val expect = docs.filter(_._1 % 5 == 4).map { case (id, h) =>
      (id, if (existing.contains(h)) 1L else 0L, existing.getOrElse(h, -1L))
    }.sortBy(_._1).toSeq
    assert(rows === expect)
    assert(rows.nonEmpty)
  }

  test("pack_sequences: contiguous offsets per source, bins cover token ranges") {
    val rows = Sampling.packSequences(spark, sf, capacity = 512L).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // per source: offsets are gapless (each doc starts where the
    // previous ended) and bin ranges match the offset arithmetic
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._1)
      val cums = ordered.scanLeft(0L)((acc, d) => acc + d._3).init
      assert(ordered.map(_._4).toSeq === cums.toSeq)
    }
    assert(rows.forall { case (_, _, n, start, b0, b1) =>
      b0 == start / 512 && b1 == (start + n - 1) / 512 && b1 >= b0 })
    // capacity 512 with multi-hundred-token docs must straddle sometimes
    assert(rows.exists { case (_, _, _, _, b0, b1) => b1 > b0 })
  }

  test("stratified sample honors per-language hash-threshold rates exactly") {
    val sampled = Sampling.sampleStratified(spark, sf).collect()
    // membership is exactly the hash predicate — recompute independently
    val want = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang")).collect()
      .filter { r =>
        val rate = Sampling.stratifiedRatesPm.getOrElse(r.getString(1), 0L)
        (r.getLong(0) % 1000000007L) * 2654435761L % 1000000007L % 1000L < rate
      }.map(_.getLong(0)).toSet
    assert(sampled.map(_.getLong(0)).toSet === want)
    assert(sampled.nonEmpty)
  }

  test("text_substring_dedup: planted shared + within-doc spans, clean doc at zero") {
    import spark.implicits._
    val span = (1 to 8).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta"),          // shares span with doc 2
      (2L, s"$span completely different tail here"),  // shares span with doc 1
      (3L, "unique words only nothing repeated anywhere at all ever"),
      (4L, s"$span and again $span")                  // within-doc repetition
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.substringDedupOf(docs, 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows(3) === ((9L, 0L, 0L, 0L)), "clean doc must report zero")
    // docs 1, 2, 4 all contain the planted span → marked
    Seq(1L, 2L, 4L).foreach { d =>
      assert(rows(d)._2 >= 1L, s"doc $d: no dup windows found")
      assert(rows(d)._3 >= 8L, s"doc $d: dup span shorter than the window")
    }
    // interval union never exceeds the doc
    rows.foreach { case (d, (n, _, dupToks, pm)) =>
      assert(dupToks <= n, s"doc $d: union $dupToks > $n tokens")
      assert(pm === dupToks * 1000 / math.max(n, 1), s"doc $d: pm mismatch")
    }
    // within-doc repetition specifically: doc 4's two copies both covered
    assert(rows(4L)._3 >= 16L, "doc 4: both span copies must be covered")

    // the scrub is the exact complement of the detection: per doc,
    // kept = total − union-covered, and clean docs pass through intact
    val scrub = TextAnalysis.substringScrubOf(docs, 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    rows.foreach { case (d, (n, _, dupToks, _)) =>
      val (sn, kept, _) = scrub(d)
      assert(sn === n)
      assert(kept === n - dupToks, s"doc $d: kept $kept != $n - $dupToks")
    }
    assert(scrub(3L)._3 === "unique words only nothing repeated anywhere at all ever")
    assert(!scrub(1L)._3.contains("shared1"), "doc 1 must lose the planted span")
    assert(scrub(1L)._3.contains("alpha") && scrub(1L)._3.contains("delta"),
      "doc 1 must keep its unique tokens")
  }

  test("text_classifier_score: bounded scores, consistent keep bit, non-degenerate") {
    val rows = TextAnalysis.classifierScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, n, score, keep) =>
      assert(n > 0, s"doc $d empty token array")
      assert(score >= -1000L && score <= 1000L, s"doc $d score $score out of band")
      assert(keep === (if (score >= 0L) 1L else 0L), s"doc $d keep/score mismatch")
    }
    // hashed pseudo-weights must spread: a constant score column would
    // mean the bucket→weight map collapsed
    assert(rows.map(_._3).distinct.length > 10)
    assert(rows.exists(_._4 === 1L) && rows.exists(_._4 === 0L))
    // deterministic rerun
    val again = TextAnalysis.classifierScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.toSeq === rows.toSeq)
  }
}
