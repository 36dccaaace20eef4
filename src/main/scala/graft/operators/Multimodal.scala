package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
