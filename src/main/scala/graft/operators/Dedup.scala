package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns._

/** Deduplication operators for LLM training-data pipelines (§2.4).
  *
  * Scale notes (100 TB): every candidate-generation step is bucket-first
  * (same-source, LSH band, hash group) — never a corpus cross-join. The
  * LSH shuffle carries only (band, hash, doc_id); raw text never moves.
  */
object Dedup {

  /** §2#24 exact dedup via md5(text) hash-groupBy: canonical doc per
    * content hash + duplicate count. */
  def exact(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("content_hash"))

  /** Documents with word-token arrays and 3-gram shingle sets. */
  private def docShingles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"),
        shingles(tokens(col("text")), 3).as("sh"))

  /** §2#25 n-gram Jaccard candidate pairs: same-source pairs sharing at
    * least one 3-gram shingle, with exact intersection/union sizes.
    * Candidate scope is the source bucket (the blocking key), so the
    * join is bucket-local, not a corpus cross-join. */
  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val a = docShingles(spark, sfDir)
      .select(col("source"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docShingles(spark, sfDir)
      .select(col("source"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("source"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long").as("inter_n"),
        size(array_union(col("sh_a"), col("sh_b"))).cast("long").as("union_n"))
      .where(col("inter_n") > 0)
      .withColumn("jaccard_pm",
        round(col("inter_n") * lit(1000.0) / col("union_n")).cast("long"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Corpus + planted near-duplicates (doc_id+1000000, last 6 words
    * dropped) — derived deterministically from the data so the
    * MinHash/SimHash machinery has guaranteed positives to find. */
  private def corpusWithPlants(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val plants = base
      .where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 6, lit(1))).as("toks"))
    base.unionByName(plants)
  }

  /** §2#26 MinHash + banded LSH near-dup detection: 96-hash signatures,
    * 32 bands × 3 rows. Narrow signature transform → explode to
    * (band, bandhash, doc_id) → shuffle on the band bucket → in-bucket
    * pair-join → signature-estimated Jaccard ≥ 0.5. */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 96; val bands = 32; val rows = k / bands
    val sigs = corpusWithPlants(spark, sfDir)
      .select(col("doc_id"),
        minhashSignature(shingles(col("toks"), 3), k).as("sig"))
      .cache()
    val banded = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * lit(rows) + 1, lit(rows))), b))))
      .toDF("doc_id", "band", "bandhash")
    val pairs = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bandhash") === col("y.bandhash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          b => b)) * lit(1000) / lit(k)).cast("long").as("est_jaccard_pm"))
      .where(col("est_jaccard_pm") >= 500)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** §2#27 SimHash near-dup: 64-bit signatures, Hamming distance ≤ 8
    * within same-source blocks + the planted duplicates. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val sigs = corpusWithPlants(spark, sfDir)
      .select(col("doc_id"), (col("doc_id") % 1000000L).as("block"),
        simhash64(col("toks")).as("sig"))
    sigs.as("x").join(sigs.as("y"),
        col("x.block") === col("y.block") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming64(col("x.sig"), col("y.sig")).cast("long").as("hamming"))
      .where(col("hamming") <= 8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** §2#28 embedding-cosine near-dup pairs: corpus = embeddings ∪ exact
    * copies of vec_id<100 (vec_id+1000000); pairs with cos ≥ 0.95 within
    * the same label block (blocking key → no corpus cross-join). */
  def embeddingNearDup(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
    val plants = base.where(col("vec_id") < 100)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"), col("emb"))
    val corpus = base.unionByName(plants)
    corpus.as("x").join(corpus.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        scaled(cosine(col("x.emb"), col("y.emb")), 1000000L).as("cos_e6"))
      .where(col("cos_e6") >= 950000L)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
