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

  /** Per-language per-mille sampling rates: downsample the dominant
    * language, upsample the tails — the standard corpus-rebalancing
    * move. (en dominates the synthetic corpus.) */
  val stratifiedRatesPm: Map[String, Long] = Map(
    "en" -> 100L, "de" -> 400L, "fr" -> 400L, "es" -> 400L, "zh" -> 400L)

  /** §2#69 sequence packing (concat-and-chunk): lay each source's
    * documents end to end in doc_id order and cut every `capacity`
    * tokens — the standard LLM pre-training batching step. Each doc
    * reports its token offset and the [bin_start, bin_end] chunk range
    * it lands in (a doc may straddle a boundary).
    *
    * Scale: one shuffle on (source) + an in-partition sort — the
    * running sum is a window over the per-source order, never a global
    * sort; sources are independent so 1000 executors pack 1000 sources
    * concurrently. Skewed giant sources would salt the window key by
    * coarse doc_id ranges and offset with per-range totals. */
  def packSequences(spark: SparkSession, sfDir: String, capacity: Long = 512L): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("source"),
        size(graft.functions.Fns.tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("tok_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("tok_start"),
        (col("tok_start") / capacity).cast("long").as("bin_start"),
        ((col("tok_start") + col("n_tokens") - 1) / capacity).cast("long").as("bin_end"))
      .orderBy(col("doc_id"))
  }

  /** §2#68 stratified sampling: per-language rates as a pure hash
    * threshold — `hash(doc_id) mod 1000 < rate_pm(lang)`.
    *
    * Unlike the bottom-k window of [[sampleDocs]], this is a STATELESS
    * per-row filter: no window, no shuffle, no state — each of 1000
    * executors decides locally, any sample of partials merges, and a
    * re-run over grown data keeps every previously-sampled doc (hash
    * threshold = consistent sampling). That's the shape that holds at
    * 100 TB; a rate change is a predicate change, not a re-shard. */
  def sampleStratified(spark: SparkSession, sfDir: String): DataFrame = {
    val bucket = (col("doc_id") * lit(2654435761L)) % lit(1000000007L) % lit(1000L)
    // rate lookup as a codegen'd when-chain over the tiny static map
    val rate = stratifiedRatesPm.toSeq.sortBy(_._1)
      .foldLeft(lit(0L)) { case (acc, (lang, pm)) =>
        when(col("lang") === lang, lit(pm)).otherwise(acc)
      }
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"),
        bucket.as("bucket"), rate.as("rate_pm"))
      .where(col("bucket") < col("rate_pm"))
      .orderBy(col("doc_id"))
  }
}
