package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deterministic sampling for training-data pipelines (§2.4/§2.6
  * adjacent): uniform per-group samples via bottom-k-by-hash.
  *
  * Unlike rand()-based sampling, bottom-k by a per-row hash is
  * merge-order independent (any partial can be combined), reproducible
  * across runs/engines, and stable under re-partitioning — the
  * properties that matter when sampling a 100 TB corpus incrementally.
  * The hash is pure integer arithmetic (Knuth multiplicative mod a
  * prime) so the DuckDB oracle computes the identical sample.
  */
object Sampling {

  /** §2#48 k docs per source, deterministically. */
  def sampleDocs(spark: SparkSession, sfDir: String, k: Int = 10): DataFrame = {
    val h = (col("doc_id") * lit(2654435761L)) % lit(1000000007L)
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), h.as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
      .orderBy(col("source"), col("rn"))
  }
}
