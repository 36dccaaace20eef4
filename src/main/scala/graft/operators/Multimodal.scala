package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling (§2.7): media as opaque `binary` columns
  * with typed metadata. The real decode libraries aren't in this
  * container, so the codec is a clearly-marked deterministic STUB —
  * but the Spark-side plumbing (schema, batching, partition-parallel
  * decode) is real and is exactly what a production decode would use.
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
  def decodeFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        // codec init happens once per partition here (amortized, like
        // mapInPandas batch shape in PySpark)
        iter.map { case (docId, blob) =>
          val (w, h, f, c) = stubDecode(blob)
          (docId, w, h, f, c)
        }
      }
      .toDF("doc_id", "width", "height", "n_frames", "feature_checksum")
      .orderBy(col("doc_id"))
  }

  /** §2#42 stub resize: decode → downscale to a 32×32 thumbnail →
    * thumbnail checksum. Same mapPartitions plumbing as decodeFeatures;
    * only the codec body is stubbed. */
  def resize(spark: SparkSession, sfDir: String, outW: Int = 32, outH: Int = 32): DataFrame = {
    import spark.implicits._
    Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (docId, blob) =>
          val (w, h, _, c) = stubDecode(blob)
          // a real impl would rescale pixels; the stub folds the scale
          // factors into the checksum deterministically
          val thumb = c * 31 + (w.toLong * outW) + (h.toLong * outH)
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
      .mapPartitions(iter => iter.map { case (id, blob) => (id, stubPixels(blob)) })
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

  /** §2#43 stub frame sampling: treat the blob as a short "video" with
    * `n_frames` from the stub decoder; emit every frame with a
    * per-frame checksum (flatMap fan-out — one output row per frame,
    * the shape a real video pipeline produces). */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (docId, blob) =>
          val (_, _, frames, c) = stubDecode(blob)
          (0 until frames).map(i => (docId, i, c * 1000003L + i))
        }
      }
      .toDF("doc_id", "frame_idx", "frame_checksum")
      .orderBy(col("doc_id"), col("frame_idx"))
  }
}
