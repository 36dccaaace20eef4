package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling (§2.7): media as opaque `binary` columns
  * with typed metadata. Still images decode for REAL — PPM/PGM and
  * 24-bit BMP via hand-written pure-JVM parsers, JPEG/PNG via the
  * JDK's own javax.imageio — as does the Y4M video container; only
  * formats with no JVM-native decoder (H.264 etc.) fall through to a
  * clearly-marked deterministic stub. The Spark-side plumbing (schema,
  * batching, partition-parallel decode) is identical on every path and
  * is exactly what a production decode would use.
  */
object Multimodal {

  /** §2#36 binary column + typed metadata: byte length, md5, header
    * sniff. The blob is derived from `text` (utf-8 bytes) — at scale
    * this column would come straight from parquet BINARY pages. */
  def binaryMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .select(col("doc_id"),
        length(col("blob")).cast("long").as("n_bytes"),
        md5(col("blob")).as("md5_hex"),
        base64(substring(col("blob"), 1, 6)).as("header_b64"))
      .orderBy(col("doc_id"))

  /** REAL pure-JVM image codec: binary netpbm (public spec) — `P6`
    * (PPM, packed RGB triples) and `P5` (PGM, one gray byte per pixel,
    * expanded here to r=g=b so the downstream RGB plane is
    * codec-uniform); header is whitespace-separated width/height/maxval
    * with `#` comments, one whitespace byte, then the raster. Zero
    * dependencies, so the decode path is exercised with REAL pixels
    * even in this container; JPEG/PNG/video codecs slot in at exactly
    * this seam. Returns None for other blobs (they fall through to the
    * stub). */
  private[operators] def decodePpm(blob: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (blob.length < 2 || blob(0) != 'P' ||
      (blob(1) != '6' && blob(1) != '5')) return None
    val gray = blob(1) == '5'
    var i = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && i < blob.length) {
        val b = blob(i)
        if (b == '#') { while (i < blob.length && blob(i) != '\n') i += 1 }
        else if (b == ' ' || b == '\n' || b == '\r' || b == '\t') i += 1
        else done = true
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < blob.length && blob(i) >= '0' && blob(i) <= '9') {
        v = v * 10 + (blob(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = int(); val h = int(); val maxval = int()
    // 2-byte-per-sample PPMs (maxval > 255) exist; out of scope here
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
    i += 1 // the single whitespace byte after maxval
    val need = w.toLong * h * (if (gray) 1 else 3)
    if (need > Int.MaxValue || i + need.toInt > blob.length) return None
    if (!gray)
      Some((w, h, java.util.Arrays.copyOfRange(blob, i, i + need.toInt)))
    else {
      val px = new Array[Byte](w * h * 3)
      var p = 0
      while (p < w * h) {
        val v = blob(i + p)
        px(p * 3) = v; px(p * 3 + 1) = v; px(p * 3 + 2) = v
        p += 1
      }
      Some((w, h, px))
    }
  }

  /** REAL pure-JVM image codec #2: uncompressed 24-bit BMP (the
    * Windows DIB format, public spec) — "BM" magic, little-endian
    * pixel-data offset at byte 10, width/height at 18/22 (height < 0 =
    * top-down row order), bit-count 24 at 28, compression 0 (BI_RGB)
    * at 30. Rows are BGR triples padded to 4-byte boundaries and
    * stored bottom-up unless top-down. Normalizes to the same packed
    * row-major RGB plane PPM produces, so every downstream stage
    * (pool, checksum, aHash) is codec-agnostic. */
  private[operators] def decodeBmp(blob: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (blob.length < 54 || blob(0) != 'B' || blob(1) != 'M') return None
    def le32(off: Int): Int =
      (blob(off) & 0xff) | ((blob(off + 1) & 0xff) << 8) |
        ((blob(off + 2) & 0xff) << 16) | ((blob(off + 3) & 0xff) << 24)
    def le16(off: Int): Int = (blob(off) & 0xff) | ((blob(off + 1) & 0xff) << 8)
    val dataOff = le32(10)
    val w = le32(18)
    val hRaw = le32(22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h <= 0 || le16(28) != 24 || le32(30) != 0) return None
    // bound dims BEFORE any Int arithmetic: a crafted header with
    // w ≈ 0x55555556 overflows w*3 to a tiny rowBytes, defeating the
    // length check below and crashing the pixel loop (review-found)
    if (w > (1 << 20) || h > (1 << 20) || w.toLong * h > maxPixels) return None
    val rowBytes = (w * 3 + 3) & ~3 // rows pad to 4-byte boundaries
    val need = dataOff.toLong + rowBytes.toLong * h
    if (dataOff < 54 || need > blob.length) return None
    val px = new Array[Byte](w * h * 3)
    var row = 0
    while (row < h) {
      val srcRow = if (topDown) row else h - 1 - row
      var x = 0
      while (x < w) {
        val s = dataOff + srcRow * rowBytes + x * 3
        val d = (row * w + x) * 3
        px(d) = blob(s + 2) // BMP stores BGR
        px(d + 1) = blob(s + 1)
        px(d + 2) = blob(s)
        x += 1
      }
      row += 1
    }
    Some((w, h, px))
  }

  /** REAL still-image codec #3: JPEG + PNG via the JDK's own
    * `javax.imageio` (java.desktop ships with every JRE — a standard
    * platform API, no added dependency). Magic-sniffed first (JPEG
    * FF D8 FF / PNG 89 'PNG') so arbitrary document bytes never pay a
    * reader probe; decoded ARGB is repacked to the same row-major RGB
    * plane the PPM/BMP decoders emit, so every downstream stage
    * (pool, checksum, aHash) stays codec-agnostic. Grayscale and CMYK
    * JPEGs come back through getRGB's color-model conversion. Returns
    * None (→ stub) for anything ImageIO can't parse. */
  private[operators] def decodeJavax(blob: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val isJpeg = blob.length > 3 && (blob(0) & 0xff) == 0xff &&
      (blob(1) & 0xff) == 0xd8 && (blob(2) & 0xff) == 0xff
    val isPng = blob.length > 8 && (blob(0) & 0xff) == 0x89 &&
      blob(1) == 'P' && blob(2) == 'N' && blob(3) == 'G'
    if (!isJpeg && !isPng) return None
    try {
      imageIoReady // one-time: in-memory streams, no temp-file cache
      // read dims from the HEADER before decoding any pixels: a
      // 100-byte dimension-bomb (IHDR claiming 25000×25000) would
      // otherwise allocate gigabytes inside ImageIO.read and kill the
      // executor with an OutOfMemoryError no catch can make safe
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(blob))
      val img =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val hw = reader.getWidth(0); val hh = reader.getHeight(0)
            if (hw <= 0 || hh <= 0 || hw.toLong * hh > maxPixels) return None
            reader.read(0)
          } finally reader.dispose()
        } finally iis.close() // MemoryCache buffers reclaim NOW, not at GC
      if (img == null) return None
      val w = img.getWidth; val h = img.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) return None
      val argb = img.getRGB(0, 0, w, h, null, 0, w)
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        val v = argb(i)
        px(i * 3) = ((v >> 16) & 0xff).toByte
        px(i * 3 + 1) = ((v >> 8) & 0xff).toByte
        px(i * 3 + 2) = (v & 0xff).toByte
        i += 1
      }
      Some((w, h, px))
    } catch {
      // truncated/corrupt files throw rather than return null
      case _: java.io.IOException | _: RuntimeException => None
    }
  }

  /** ImageIO's default scratch cache is a TEMP FILE per decode — at
    * mapPartitions rates that is an fsync per image. Switch it to
    * in-memory once per JVM (executors re-run this on their own
    * classloader, which is exactly what we want). */
  private lazy val imageIoReady: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Any supported REAL still-image codec → row-major RGB plane. */
  private[operators] def decodeImage(blob: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    decodePpm(blob).orElse(decodeBmp(blob)).orElse(decodeJavax(blob))

  /** Decode-size ceiling for untrusted blobs: 2^27 px (134 MP, ~512 MB
    * of ARGB ints) covers any real-world crawl image while bounding
    * what a crafted header can make one task allocate. Oversize
    * decodables fall through to the deterministic stub like any other
    * undecodable blob — the documented policy for this pipeline. */
  private[operators] val maxPixels: Long = 1L << 27

  /** 16-bin integer-luma histogram over an RGB pixel plane — the ONE
    * definition #161 (histogram) and #177 (entropy) both distill from;
    * a luma-weighting or bin-count change lands in both ops at once. */
  private[operators] def lumaBins(px: Array[Byte]): Array[Long] = {
    val bins = new Array[Long](16)
    var i = 0
    while (i + 2 < px.length) {
      val luma = ((px(i) & 0xff) + (px(i + 1) & 0xff) +
        (px(i + 2) & 0xff)) / 3
      bins(luma >> 4) += 1
      i += 3
    }
    bins
  }

  private[operators] def checksumOf(bytes: Array[Byte]): Long = {
    var cs = 1125899906842597L
    var i = 0
    while (i < bytes.length) { cs = cs * 31 + bytes(i); i += 1 }
    cs
  }

  /** Codec front door: REAL decode for formats the JVM can parse here
    * (PPM, BMP stills; Y4M video), deterministic stub for everything
    * else. (width, height, n_frames, feature checksum over the DECODED
    * pixels for real formats / the raw bytes for stubbed ones). */
  private[operators] def decodeAny(blob: Array[Byte]): (Int, Int, Int, Long) =
    decodeImage(blob) match {
      case Some((w, h, px)) => (w, h, 1, checksumOf(px))
      case None => decodeY4m(blob) match {
        case Some((w, h, frames)) =>
          (w, h, frames.length,
            frames.foldLeft(1125899906842597L)((cs, f) => cs * 31 + checksumOf(f)))
        case None => stubDecode(blob)
      }
    }

  /** STUB CODEC — stands in for an image/video decoder (not available
    * in this container). Deterministic in the blob bytes so tests are
    * stable. A real deployment swaps only this function; the
    * mapPartitions plumbing around it is unchanged. */
  private def stubDecode(blob: Array[Byte]): (Int, Int, Int, Long) = {
    var checksum = 1125899906842597L
    var i = 0
    while (i < blob.length) { checksum = checksum * 31 + blob(i); i += 1 }
    val width = 64 + math.floorMod(checksum, 64).toInt
    val height = 64 + math.floorMod(checksum >> 8, 64).toInt
    val frames = 1 + math.floorMod(checksum >> 16, 8).toInt
    (width, height, frames, checksum)
  }

  /** §2#37 batched decode → feature extraction over mapPartitions:
    * each partition decodes its blobs locally (this is where a real
    * pipeline amortizes codec init per partition, the moral equivalent
    * of mapInPandas batch shape in PySpark). */
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame =
    decodeFeaturesOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")))

  /** The decode pipeline over ANY (doc_id, blob) frame — the sfDir
    * entry point feeds it document bytes (stub path); the spec feeds
    * it real PPM images (real path). Same plan either way. */
  def decodeFeaturesOf(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // codec init happens once per partition here (amortized, like
        // mapInPandas batch shape in PySpark)
        iter.map { case (docId, blob) =>
          val (w, h, f, c) = decodeAny(blob)
          (docId, w, h, f, c)
        }
      }
      .toDF("doc_id", "width", "height", "n_frames", "feature_checksum")
      .orderBy(col("doc_id"))
  }

  /** §2#161 per-image LUMA HISTOGRAM — the exposure profile a vision
    * curation pipeline filters on (mass piled in the extreme bins =
    * over/under-exposed or synthetic-flat images; LAION-style corpus
    * QA): 16 bins over integer luma (r+g+b)/3 of the REAL decoded
    * pixels (PPM/BMP/JPEG/PNG), fixed 16 rows per image so consumers
    * aggregate without densifying; stub (undecodable) blobs emit their
    * 16 rows zeroed with `src='stub'` — plumbing-complete, honestly
    * marked, never fake statistics. Same amortized mapPartitions
    * decode stage as every multimodal op; the fan-out is ×16 on
    * |images| rows, not pixels. */
  def imageHistogram(spark: SparkSession, sfDir: String): DataFrame =
    imageHistogramOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")))

  /** The histogram pipeline over ANY (doc_id, blob) frame. */
  def imageHistogramOf(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, blob) =>
          decodeImage(blob) match {
            case Some((_, _, px)) =>
              val bins = lumaBins(px)
              (0 until 16).map(b => (docId, b, bins(b), "real"))
            case None =>
              (0 until 16).map(b => (docId, b, 0L, "stub"))
          }
        }
      }
      .toDF("doc_id", "bin", "n_px", "src")
      .orderBy(col("doc_id"), col("bin"))
  }

  /** REAL thumbnail for decodable blobs: box-filter (average-pool)
    * the RGB plane onto an outW×outH grid — each output pixel is the
    * integer mean of its source rectangle, the standard area-average
    * downscale. Returns the packed RGB thumbnail bytes. */
  private[operators] def averagePool(w: Int, h: Int, px: Array[Byte],
      outW: Int, outH: Int): Array[Byte] = {
    val outPx = new Array[Byte](outW * outH * 3)
    var oy = 0
    while (oy < outH) {
      val y0 = (oy.toLong * h / outH).toInt
      val y1 = math.max(y0 + 1, ((oy + 1).toLong * h / outH).toInt)
      var ox = 0
      while (ox < outW) {
        val x0 = (ox.toLong * w / outW).toInt
        val x1 = math.max(x0 + 1, ((ox + 1).toLong * w / outW).toInt)
        var c = 0
        while (c < 3) {
          var sum = 0L; var n = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              sum += px((y * w + x) * 3 + c) & 0xff
              n += 1
              x += 1
            }
            y += 1
          }
          outPx((oy * outW + ox) * 3 + c) = (sum / n).toByte
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    outPx
  }

  /** §2#42 resize: decode → downscale to an outW×outH thumbnail →
    * thumbnail checksum. PPM/BMP blobs take the REAL path (decode + box
    * average pool over actual pixels); other blobs the stub (scale
    * factors folded into the checksum). Same mapPartitions plumbing
    * either way. */
  def resize(spark: SparkSession, sfDir: String, outW: Int = 32, outH: Int = 32): DataFrame =
    resizeOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")),
      outW, outH)

  /** The resize pipeline over ANY (doc_id, blob) frame. */
  def resizeOf(blobs: DataFrame, outW: Int = 32, outH: Int = 32): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, blob) =>
          val thumb = decodeImage(blob) match {
            case Some((w, h, px)) =>
              // real pixels: pool, then checksum the REAL thumbnail
              checksumOf(averagePool(w, h, px, outW, outH))
            case None =>
              val (w, h, _, c) = stubDecode(blob)
              c * 31 + (w.toLong * outW) + (h.toLong * outH)
          }
          (docId, outW, outH, thumb)
        }
      }
      .toDF("doc_id", "out_w", "out_h", "thumb_checksum")
      .orderBy(col("doc_id"))
  }

  /** STUB pixel decode: 64 deterministic 8-bit luma values standing in
    * for a decoded 8×8 grayscale downsample. Identical blobs give
    * identical pixels (what the aHash needs); a real decoder also gives
    * CORRELATED pixels for re-encoded variants, which the stub cannot —
    * the spec plants pixel-level perturbations to cover that case. */
  private def stubPixels(blob: Array[Byte]): Array[Long] = {
    var cs = 1125899906842597L
    var i = 0
    while (i < blob.length) { cs = cs * 31 + blob(i); i += 1 }
    Array.tabulate(64)(p =>
      math.floorMod(cs * (2 * p + 1) + 0x9E3779B97F4A7C15L * p, 256L))
  }

  /** REAL 8×8 grayscale downsample for decodable blobs: box-average
    * the RGB plane to 8×8, then integer luma (r+g+b)/3 per cell — the
    * aHash input a real image pipeline computes. Falls back to the
    * stub for non-image blobs, so one frame mixes real and synthetic
    * corpora transparently. */
  private[operators] def grayPixels(blob: Array[Byte]): Array[Long] =
    decodeImage(blob) match {
      case Some((w, h, px)) =>
        val thumb = averagePool(w, h, px, 8, 8)
        Array.tabulate(64) { p =>
          ((thumb(p * 3) & 0xff) + (thumb(p * 3 + 1) & 0xff) +
            (thumb(p * 3 + 2) & 0xff)) / 3L
        }
      case None => stubPixels(blob)
    }

  /** 64-bit average-hash (aHash) from an 8×8 pixel array, computed as
    * REAL distributed column arithmetic (the only stub is the decode):
    * bit i is set iff pixel_i >= the integer mean. */
  private[operators] def aHash(px: Column): Column = {
    // integer mean of 64 bounded pixel values (sum <= 16320, so the
    // double division truncates exactly like integer div)
    val mean = (aggregate(px, lit(0L), (a, x) => a + x) / lit(64)).cast("long")
    val powers = typedLit((0 until 64).map(1L << _))
    aggregate(
      zip_with(px, powers, (p, pw) => when(p >= mean, pw).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)
  }

  /** §2#101 perceptual-hash image near-dup detection: stub-decode each
    * blob to 8×8 grayscale, aHash it (mean-threshold bit per pixel —
    * the classic perceptual fingerprint: robust to re-encoding and
    * small edits because only pixels near the mean can flip), then find
    * pairs within Hamming ≤ 8 via the SAME Manku block-pair banding as
    * dedup_simhash — one shuffle on bucket keys carrying (bucket, id,
    * sig), never pixels. Plants: every 10th image re-appears as
    * id+1000000 with its first 4 pixels REVERSED — a mirrored-corner
    * variant that preserves the pixel multiset (hence the mean, hence
    * every other bit), so at most 4 aHash bits differ: within radius
    * by construction. (A mean-shifting edit can flip every borderline
    * bit — that is aHash's documented sensitivity, not a plant bug.)
    * Hash-based output → rows-only check; the spec pins recall. */
  def phashDedup(spark: SparkSession, sfDir: String, maxHamming: Int = 8): DataFrame = {
    import spark.implicits._
    val pixels = Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(iter => iter.map { case (id, blob) => (id, grayPixels(blob)) })
      .toDF("doc_id", "px")
    val withPlants = pixels.unionByName(
      pixels.where(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          zip_with(col("px"), sequence(lit(0), lit(63)),
            (p, i) => when(i < 4, element_at(col("px"), lit(4) - i)).otherwise(p))
            .as("px")))
    val sigs = withPlants.select(col("doc_id"), aHash(col("px")).as("sig"))
    Dedup.hammingPairs64(sigs, maxHamming)
  }

  /** REAL pure-JVM VIDEO container: YUV4MPEG2 (mjpegtools "Y4M",
    * public spec) — ASCII stream header `YUV4MPEG2` + space-separated
    * `W<width> H<height> F<fps> I<ilace> A<aspect> C<chroma>` params
    * ending in `\n`, then per frame an ASCII `FRAME[params]\n` marker
    * followed by raw planar YCbCr. Supported chroma: `C420*` (any 420
    * variant — all share the w·h + 2·(w/2·h/2) plane size), `C444`,
    * and `Cmono`; default when absent is 420. Returns each frame's
    * LUMA plane (w·h bytes) — what a sampling/feature pipeline reads;
    * chroma is parsed past, not returned. */
  private[operators] def decodeY4m(blob: Array[Byte]): Option[(Int, Int, Seq[Array[Byte]])] = {
    val magic = "YUV4MPEG2".getBytes("US-ASCII")
    if (blob.length < magic.length + 1 ||
      !java.util.Arrays.equals(java.util.Arrays.copyOf(blob, magic.length), magic))
      return None
    var i = magic.length
    val hdrEnd = blob.indexOf('\n'.toByte, i)
    if (hdrEnd < 0) return None
    val params = new String(blob, i, hdrEnd - i, "US-ASCII").trim
      .split("\\s+").filter(_.nonEmpty)
    var w = -1; var h = -1; var chroma = "420"
    params.foreach { p =>
      p.charAt(0) match {
        // malformed params ("W", "W5x", "W99999999999") must bail to
        // None, not throw NumberFormatException (review-found)
        case 'W' => w = p.drop(1).toIntOption.getOrElse(return None)
        case 'H' => h = p.drop(1).toIntOption.getOrElse(return None)
        case 'C' => chroma = p.drop(1)
        case _ => () // F/I/A/X params don't affect plane layout
      }
    }
    if (w <= 0 || h <= 0) return None
    val frameBytes: Long =
      if (chroma.startsWith("420")) w.toLong * h + 2L * ((w / 2).toLong * (h / 2))
      else if (chroma == "444") w.toLong * h * 3
      else if (chroma == "mono") w.toLong * h
      else return None
    if (frameBytes > Int.MaxValue) return None
    i = hdrEnd + 1
    val frames = Seq.newBuilder[Array[Byte]]
    while (i < blob.length) {
      // each frame: "FRAME[ params]\n" then the planes
      if (i + 5 > blob.length ||
        new String(blob, i, 5, "US-ASCII") != "FRAME") return None
      val fEnd = blob.indexOf('\n'.toByte, i + 5)
      if (fEnd < 0 || fEnd + 1 + frameBytes > blob.length + 0L) return None
      val lumaStart = fEnd + 1
      frames += java.util.Arrays.copyOfRange(blob, lumaStart, lumaStart + w * h)
      i = lumaStart + frameBytes.toInt
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some((w, h, fs))
  }

  /** REAL pure-JVM AUDIO codec: RIFF/WAVE PCM (the public WAVE file
    * layout): `RIFF` + u32 size + `WAVE`, then a sequence of chunks —
    * u32-LE-sized, word-aligned — of which `fmt ` carries
    * audioFormat(1 = integer PCM) / channels / sampleRate /
    * bitsPerSample(8|16) and `data` carries the interleaved frames;
    * every other chunk id (LIST, fact, cue …) is skipped over like any
    * real parser does. Samples normalize to signed 16-bit (8-bit WAVs
    * are unsigned midpoint-128, shifted up 8) and channels mix down to
    * integer-mean mono — the representation an audio feature pipeline
    * runs on. Returns (channels, sampleRate, mono samples); None (→
    * stub) for anything not a well-formed integer-PCM WAV. */
  private[operators] def decodeWav(blob: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (blob.length < 44 ||
      blob(0) != 'R' || blob(1) != 'I' || blob(2) != 'F' || blob(3) != 'F' ||
      blob(8) != 'W' || blob(9) != 'A' || blob(10) != 'V' || blob(11) != 'E')
      return None
    def le16(off: Int): Int = (blob(off) & 0xff) | ((blob(off + 1) & 0xff) << 8)
    def le32(off: Int): Long = (le16(off).toLong | (le16(off + 2).toLong << 16))
    var i = 12
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (i + 8 <= blob.length && (dataOff < 0 || channels < 0)) {
      val id = new String(blob, i, 4, "US-ASCII")
      val size = le32(i + 4)
      if (size < 0 || i + 8 + size > blob.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(i + 8)
          if (audioFormat != 1) return None // integer PCM only
          channels = le16(i + 10)
          rate = le32(i + 12).toInt
          bits = le16(i + 22)
        case "data" =>
          dataOff = i + 8; dataLen = size.toInt
        case _ => () // skip LIST/fact/cue/…
      }
      i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || dataOff < 0) return None
    if (bits != 8 && bits != 16) return None
    val bytesPerFrame = channels * (bits / 8)
    val nFrames = dataLen / bytesPerFrame
    if (nFrames <= 0) return None
    val mono = new Array[Int](nFrames)
    var f = 0
    while (f < nFrames) {
      var sum = 0
      var c = 0
      while (c < channels) {
        val off = dataOff + f * bytesPerFrame + c * (bits / 8)
        sum += (if (bits == 16) le16(off).toShort.toInt
                else ((blob(off) & 0xff) - 128) << 8)
        c += 1
      }
      mono(f) = sum / channels
      f += 1
    }
    Some((channels, rate, mono))
  }

  /** STUB audio features for non-WAV blobs — deterministic in the
    * bytes, shaped like a plausible clip (8/16/32 kHz, mono/stereo). */
  private def stubAudio(blob: Array[Byte]): (Int, Int, Int, Long, Long) = {
    val cs = checksumOf(blob)
    val channels = 1 + math.floorMod(cs, 2).toInt
    val rate = 8000 << math.floorMod(cs >> 8, 3).toInt
    val n = 1000 + math.floorMod(cs >> 16, 9000).toInt
    val rms = math.floorMod(cs >> 24, 8192)
    val peak = rms + math.floorMod(cs >> 40, 8192)
    (channels, rate, n, rms, peak)
  }

  /** §2#142 audio feature extraction: WAV blobs take the REAL path —
    * parse the RIFF container, normalize to 16-bit mono, emit the
    * duration/RMS/peak numbers an audio curation pipeline filters on
    * (silence and clipping detection); other blobs emit the stub's
    * synthetic clip. Same mapPartitions plumbing as the image decode —
    * codec init amortizes per partition, blobs never shuffle. */
  def audioFeatures(spark: SparkSession, sfDir: String): DataFrame =
    audioFeaturesOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")))

  /** The audio-feature pipeline over ANY (doc_id, blob) frame. */
  def audioFeaturesOf(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, blob) =>
          decodeWav(blob) match {
            case Some((channels, rate, mono)) =>
              var sumSq = 0L; var peak = 0L
              var j = 0
              while (j < mono.length) {
                val v = mono(j).toLong
                sumSq += v * v
                if (math.abs(v) > peak) peak = math.abs(v)
                j += 1
              }
              val rms = math.sqrt(sumSq.toDouble / mono.length).toLong
              (docId, channels, rate, mono.length.toLong,
                mono.length.toLong * 1000L / rate, rms, peak)
            case None =>
              val (channels, rate, n, rms, peak) = stubAudio(blob)
              (docId, channels, rate, n.toLong, n.toLong * 1000L / rate,
                rms, peak)
          }
        }
      }
      .toDF("doc_id", "channels", "sample_rate", "n_samples",
        "duration_ms", "rms", "peak")
      .orderBy(col("doc_id"))
  }

  /** §2#144 VAD-style audio segmentation: split a clip into voiced
    * utterances by energy — the chop an ASR-training pipeline applies
    * before transcription. 20 ms windows; a window is voiced when its
    * RMS clears one tenth of the clip's peak (relative, so quiet
    * recordings segment like loud ones; integer cross-multiplication,
    * no floats); consecutive voiced windows merge into segments. One
    * row per segment with start/end ms and mean window RMS. WAV blobs
    * take the REAL path; other blobs emit the stub's deterministic
    * pseudo-segments. flatMap fan-out like frame sampling — the
    * utterance-per-row shape downstream batching consumes. */
  def audioSegments(spark: SparkSession, sfDir: String): DataFrame =
    audioSegmentsOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")))

  /** The segmentation pipeline over ANY (doc_id, blob) frame. */
  def audioSegmentsOf(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, blob) =>
          decodeWav(blob) match {
            case Some((_, rate, mono)) => segmentVoiced(rate, mono)
              .zipWithIndex.map { case ((startMs, endMs, meanRms), i) =>
                (docId, i, startMs, endMs, meanRms)
              }
            case None =>
              // stub: 1-3 deterministic pseudo-utterances per blob
              val (_, rate, n, rms, _) = stubAudio(blob)
              val durMs = n.toLong * 1000L / rate
              val k = 1 + math.floorMod(rms, 3).toInt
              (0 until k).map { i =>
                val startMs = durMs * (2 * i) / (2 * k)
                val endMs = durMs * (2 * i + 1) / (2 * k)
                (docId, i, startMs, endMs, rms)
              }
          }
        }
      }
      .toDF("doc_id", "seg_idx", "start_ms", "end_ms", "mean_rms")
      .orderBy(col("doc_id"), col("seg_idx"))
  }

  /** Linear-interpolation resampling of a mono s16 clip to `outRate` —
    * integer-exact: output i sits at source position i·R1/R2, computed
    * as quotient+remainder so identical inputs resample identically on
    * every JVM (no float accumulation). The standard normalize-to-16k
    * step every speech pipeline runs before featurization. */
  private[operators] def resampleLinear(inRate: Int, outRate: Int,
      mono: Array[Int]): Array[Int] = {
    if (inRate == outRate || mono.length == 0) return mono
    val nOut = (mono.length.toLong * outRate / inRate).toInt
    val out = new Array[Int](nOut)
    var i = 0
    while (i < nOut) {
      val posNum = i.toLong * inRate
      val src = (posNum / outRate).toInt
      val frac = posNum % outRate
      val a = mono(src).toLong
      val b = mono(math.min(src + 1, mono.length - 1)).toLong
      out(i) = ((a * (outRate - frac) + b * frac) / outRate).toInt
      i += 1
    }
    out
  }

  /** §2#147 audio resampling: WAV blobs decode, mix to mono, and
    * resample to a 16 kHz target (the ASR-standard rate) — emitting
    * in/out sample counts and a checksum over the RESAMPLED signal, so
    * any drift in the DSP is hash-visible; non-WAV blobs emit the
    * stub's synthetic numbers. Completes the audio family's mirror of
    * the image ops (features ≙ decode, segments ≙ frame-sample,
    * resample ≙ resize). */
  def audioResample(spark: SparkSession, sfDir: String,
      outRate: Int = 16000): DataFrame =
    audioResampleOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")),
      outRate)

  /** The resample pipeline over ANY (doc_id, blob) frame. */
  def audioResampleOf(blobs: DataFrame, outRate: Int = 16000): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, blob) =>
          decodeWav(blob) match {
            case Some((_, rate, mono)) =>
              val res = resampleLinear(rate, outRate, mono)
              var cs = 1125899906842597L
              var j = 0
              while (j < res.length) { cs = cs * 31 + res(j); j += 1 }
              (docId, rate, mono.length.toLong, outRate, res.length.toLong, cs)
            case None =>
              val (_, rate, n, _, _) = stubAudio(blob)
              val nOut = n.toLong * outRate / rate
              (docId, rate, n.toLong, outRate, nOut, checksumOf(blob))
          }
        }
      }
      .toDF("doc_id", "rate_in", "n_in", "rate_out", "n_out", "resample_checksum")
      .orderBy(col("doc_id"))
  }

  /** §2#177 per-image LUMA ENTROPY — the one-number exposure/content
    * verdict distilled from #161's histogram (LAION-style corpus QA
    * thresholds on it directly): Shannon entropy over the 16-bin luma
    * distribution in MILLI-BITS (0 = flat synthetic fill, 4000 = all
    * bins equal), `floor(−Σ p·log2(p) · 1000)` — near-zero entropy
    * flags solid-color placeholders and tracking pixels, saturated
    * entropy flags noise; real curation drops both tails. Integer
    * column, deterministic double log2 per fixed histogram. Same
    * amortized mapPartitions decode as every codec op; stub blobs emit
    * zeroed rows marked `src='stub'`. */
  def imageEntropy(spark: SparkSession, sfDir: String): DataFrame =
    imageEntropyOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")))

  /** The entropy pipeline over ANY (doc_id, blob) frame. */
  def imageEntropyOf(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, blob) =>
          decodeImage(blob) match {
            case Some((_, _, px)) =>
              val bins = lumaBins(px)
              val n = bins.sum
              var h = 0.0
              var b = 0
              while (b < 16) {
                if (bins(b) > 0) {
                  val p = bins(b).toDouble / n
                  h -= p * (math.log(p) / math.log(2.0))
                }
                b += 1
              }
              (docId, n, math.floor(h * 1000.0).toLong, "real")
            case None => (docId, 0L, 0L, "stub")
          }
        }
      }
      .toDF("doc_id", "n_px", "entropy_mb", "src")
      .orderBy(col("doc_id"))
  }

  /** §2#174 frame-energy SNR estimate — the speech-corpus QA signal an
    * ASR curation pipeline thresholds on (noisy field recordings and
    * silence-padded clips both get dropped): 20 ms frame RMS values,
    * noise floor = their p10, signal level = their p90,
    * `snr_db_e1 = round(200·log10(p90/p10))` in integer DECI-dB (no
    * float column crosses the engine boundary). The percentile-energy
    * method — no VAD labels needed, robust to where in the clip the
    * speech sits; clips that are all one level (tone, hiss) read ≈0 dB
    * and pure digital silence reads 0/0. Capped at 99.0 dB when the
    * floor is digital zero. Same amortized mapPartitions batch shape
    * as every codec op; stub (non-WAV) blobs emit zeroed rows marked
    * `src='stub'` — plumbing-complete, never fake statistics. */
  def audioSnr(spark: SparkSession, sfDir: String): DataFrame =
    audioSnrOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")))

  /** The SNR pipeline over ANY (doc_id, blob) frame. */
  def audioSnrOf(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, blob) =>
          decodeWav(blob) match {
            case Some((_, rate, mono)) if mono.nonEmpty =>
              val win = math.max(rate / 50, 1) // 20 ms, as segmentVoiced
              val nWin = (mono.length + win - 1) / win
              val rms = new Array[Long](nWin)
              var w = 0
              while (w < nWin) {
                val lo = w * win
                val hi = math.min(lo + win, mono.length)
                var sumSq = 0L
                var j = lo
                while (j < hi) { val v = mono(j).toLong; sumSq += v * v; j += 1 }
                rms(w) = math.sqrt(sumSq.toDouble / (hi - lo)).toLong
                w += 1
              }
              java.util.Arrays.sort(rms)
              val p10 = rms((nWin - 1) / 10)
              val p90 = rms((nWin - 1) * 9 / 10)
              val snrE1 =
                if (p90 == 0L) 0L // digital silence
                else if (p10 == 0L) 990L // zero floor: cap at 99.0 dB
                else math.min(990L,
                  math.round(200.0 * math.log10(p90.toDouble / p10)))
              (docId, nWin.toLong, p10, p90, snrE1, "real")
            case _ => (docId, 0L, 0L, 0L, 0L, "stub")
          }
        }
      }
      .toDF("doc_id", "n_frames", "noise_rms", "signal_rms", "snr_db_e1", "src")
      .orderBy(col("doc_id"))
  }

  /** Windowed energy segmentation of a mono s16 clip: (start ms,
    * end ms, mean window RMS) per run of voiced 20 ms windows.
    * Voiced ⇔ 10·windowRms ≥ clipPeak (integer cross-multiply). */
  private[operators] def segmentVoiced(rate: Int,
      mono: Array[Int]): Seq[(Long, Long, Long)] = {
    val win = math.max(rate / 50, 1) // 20 ms of samples
    val nWin = (mono.length + win - 1) / win
    var peak = 0L
    var i = 0
    while (i < mono.length) {
      val v = math.abs(mono(i).toLong); if (v > peak) peak = v; i += 1
    }
    if (peak == 0L) return Seq.empty // digital silence: no utterances
    val rms = new Array[Long](nWin)
    var w = 0
    while (w < nWin) {
      val lo = w * win
      val hi = math.min(lo + win, mono.length)
      var sumSq = 0L
      var j = lo
      while (j < hi) { val v = mono(j).toLong; sumSq += v * v; j += 1 }
      rms(w) = math.sqrt(sumSq.toDouble / (hi - lo)).toLong
      w += 1
    }
    val segs = Seq.newBuilder[(Long, Long, Long)]
    var start = -1
    var acc = 0L
    def close(endWin: Int): Unit = if (start >= 0) {
      val startMs = start.toLong * win * 1000L / rate
      val endMs = math.min(endWin.toLong * win, mono.length.toLong) * 1000L / rate
      // a burst whose whole span rounds to the same millisecond is
      // noise, not an utterance — emitting it would produce degenerate
      // zero-length rows (property-test-found at 44.1 kHz sub-ms clips)
      if (endMs > startMs) segs += ((startMs, endMs, acc / (endWin - start)))
      start = -1; acc = 0L
    }
    w = 0
    while (w < nWin) {
      if (rms(w) * 10L >= peak) {
        if (start < 0) start = w
        acc += rms(w)
      } else close(w)
      w += 1
    }
    close(nWin)
    segs.result()
  }

  /** §2#43 frame sampling: Y4M blobs take the REAL path — parse the
    * container, emit one row per frame with the frame's integer mean
    * luma and luma-plane checksum (the per-frame features a
    * sample-every-Nth scheduler filters on); other blobs emit the stub
    * decoder's synthetic frames. flatMap fan-out either way — one
    * output row per frame, the shape a real video pipeline produces. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame =
    frameSampleOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")))

  /** The frame-sampling pipeline over ANY (doc_id, blob) frame. */
  def frameSampleOf(blobs: DataFrame): DataFrame =
    frameFeaturesOf(blobs).orderBy(col("doc_id"), col("frame_idx"))

  /** Per-frame features (unsorted — the shared decode stage under
    * [[frameSampleOf]] and [[keyframesOf]]). */
  private def frameFeaturesOf(blobs: DataFrame): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs
      .select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, blob) =>
          decodeY4m(blob) match {
            case Some((_, _, frames)) =>
              frames.zipWithIndex.map { case (luma, idx) =>
                var sum = 0L
                var j = 0
                while (j < luma.length) { sum += luma(j) & 0xff; j += 1 }
                (docId, idx, checksumOf(luma), sum / math.max(luma.length, 1))
              }
            case None =>
              val (_, _, frames, c) = stubDecode(blob)
              (0 until frames).map(i => (docId, i, c * 1000003L + i, -1L))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_checksum", "mean_luma")
  }

  /** §2#153 scene-cut KEYFRAME detection — the video-curation step
    * that picks which frames a captioning/embedding pipeline actually
    * processes (decoding every frame of a 100 TB video corpus is the
    * cost ceiling; keyframes are the budget): a frame is a keyframe if
    * it opens its video (`first`) or its mean luma jumps ≥ `threshold`
    * (of 255) against the previous frame (`cut` — the classic
    * hard-cut detector; gradual fades stay below it by design).
    *
    * Split of labor: the CODEC runs once per blob inside the
    * amortized `mapPartitions` decode stage (shared with
    * [[frameSampleOf]]); the DETECTION is relational — a 1-frame lag
    * window per doc over the |frames|-sized feature frame — so
    * Catalyst plans it, the threshold is a plan literal, and the
    * decode never re-runs when the rule changes. Stub (non-video)
    * blobs carry mean_luma −1 on every frame → delta 0 → only their
    * opening frame emits, never a false cut. */
  def keyframes(spark: SparkSession, sfDir: String,
      threshold: Long = 32L): DataFrame =
    keyframesOf(
      Tables.documentsPar(spark, sfDir)
        .select(col("doc_id"), col("text").cast("binary").as("blob")),
      threshold)

  /** Keyframe detection over ANY (doc_id, blob) frame. */
  def keyframesOf(blobs: DataFrame, threshold: Long = 32L): DataFrame = {
    require(threshold > 0, s"cut threshold must be positive: $threshold")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameFeaturesOf(blobs)
      .withColumn("delta_luma",
        coalesce(col("mean_luma") - lag(col("mean_luma"), 1).over(w), lit(0L)))
      .withColumn("reason",
        when(col("frame_idx") === 0, lit("first"))
          .when(col("mean_luma") >= 0 && abs(col("delta_luma")) >= threshold,
            lit("cut")))
      .where(col("reason").isNotNull)
      .select(col("doc_id"), col("frame_idx"), col("mean_luma"),
        col("delta_luma"), col("reason"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
