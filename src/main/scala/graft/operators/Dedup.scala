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
    Tables.documentsPar(spark, sfDir)
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"), count(lit(1)).as("n_dups"))
      .orderBy(col("content_hash"))

  /** Documents with word-token arrays and 3-gram shingle sets. */
  private def docShingles(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("source"),
        shingles(tokens(col("text")), 3).as("sh"))

  /** §2#25 n-gram Jaccard candidate pairs via a set-similarity join:
    * explode shingles, join same-source docs on equal shingles, count
    * matches per pair (= exact |A∩B| since shingle sets are distinct),
    * then |A∪B| = |A|+|B|−|A∩B|. The shuffle key is (source, shingle),
    * so work scales with shingle collisions — never a doc×doc
    * cross-join, and the whole thing is codegen'd (no per-pair
    * interpreted set ops). */
  /** Shared candidate generation: (doc_a, doc_b, inter_n) for
    * same-source pairs sharing ≥1 shingle, via the set-similarity
    * join. Single shingle evaluation: explode once and cache the
    * (small) exploded frame — it feeds both join sides. */
  private def candidateInter(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    // shingle HASHES end to end — never materialize shingle strings:
    // set ops on 64-bit window hashes equal set ops on the strings
    // (collision odds ~1e-10 for this corpus), at ~1/3 the CPU and
    // shuffle bytes
    val ex = Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), col("source"),
        explode(shingleHashes(tokens(col("text")), 3)).as("sh8"))
      .cache()
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = ex.select(col("source"), col("sh8"), col("doc_id").as("doc_a"))
    val b = ex.select(col("source"), col("sh8"), col("doc_id").as("doc_b"))
    val inter = a.join(b, Seq("source", "sh8"))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_n"))
    (inter, sizes)
  }

  /** Candidate edge list only (for clustering). */
  def candidatePairs(spark: SparkSession, sfDir: String): DataFrame = {
    val (inter, _) = candidateInter(spark, sfDir)
    inter.select(col("doc_a"), col("doc_b"))
  }

  def ngramJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val (inter, sizes) = candidateInter(spark, sfDir)
    inter
      .join(broadcast(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))), "doc_a")
      .join(broadcast(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("inter_n"),
        (col("n_a") + col("n_b") - col("inter_n")).as("union_n"))
      .withColumn("jaccard_pm",
        round(col("inter_n") * lit(1000.0) / col("union_n")).cast("long"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** §2#45 dedup clustering: connected components over the n-gram
    * candidate-pair graph via hash-min label propagation — each doc's
    * cluster id is the minimum doc_id reachable through shared-shingle
    * edges. The driver loop runs O(component diameter) rounds of a
    * min-label broadcast join; this is exactly the large-scale CC
    * algorithm (each round = one shuffle), so it holds at 100 TB where
    * a recursive CTE or union-find cannot. */
  def cluster(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = candidatePairs(spark, sfDir)
    val bidir = edges
      .unionByName(edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))
        .select(col("doc_a"), col("doc_b")))
      .cache()
    val nodes = Tables.documentsPar(spark, sfDir).select(col("doc_id"))
    // localCheckpoint each round truncates the lineage — without it the
    // iterative plan nests exponentially and blows up the driver
    var labels = nodes.select(col("doc_id"), col("doc_id").as("lab"))
      .localCheckpoint(true)
    // labels only ever decrease, so sum(lab) is a strictly-monotone
    // convergence witness — one scalar agg per round instead of a
    // labels⋈labels change-detection join
    var prevSum = Long.MinValue
    var converged = false
    var rounds = 0
    while (!converged && rounds < 20) {
      val viaEdges = labels.join(bidir, labels("doc_id") === bidir("doc_a"))
        .select(col("doc_b").as("doc_id"), col("lab"))
      val next = labels.select(col("doc_id"), col("lab"))
        .unionByName(viaEdges)
        .groupBy(col("doc_id")).agg(min(col("lab")).as("lab"))
        .localCheckpoint(true)
      val labSum = next.agg(sum(col("lab"))).collect()(0).getLong(0)
      converged = labSum == prevSum
      prevSum = labSum
      labels = next
      rounds += 1
    }
    val out = labels.select(col("doc_id"), col("lab").as("cluster_id"))
      .orderBy(col("doc_id"))
    bidir.unpersist()
    out
  }

  /** Corpus + planted near-duplicates (doc_id+1000000, last 3 words
    * dropped → shingle Jaccard ≥ ~0.85 even for the shortest docs) —
    * derived deterministically from the data so the MinHash/SimHash
    * machinery has guaranteed positives to find. */
  private def corpusWithPlants(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documentsPar(spark, sfDir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
    val plants = base
      .where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 3, lit(1))).as("toks"))
    base.unionByName(plants)
  }

  /** §2#26 MinHash + banded LSH near-dup detection: 96-hash signatures,
    * 32 bands × 3 rows. Signatures are built as 96 codegen'd `min`
    * aggregates over exploded shingles (map-side partial, one shuffle
    * on doc_id) → band rows (band, bandhash, doc_id) → shuffle on the
    * band bucket → in-bucket pair-join → signature-estimated
    * Jaccard ≥ 0.5. */
  def minhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    val k = 96; val bands = 32; val rows = k / bands
    // shingle-window hashes directly (no strings), then derive the k
    // seeded hashes from the 8-byte base hash
    val ex = corpusWithPlants(spark, sfDir)
      .select(col("doc_id"), explode(shingleHashes(col("toks"), 3)).as("h0"))
    val minAggs = (0 until k).map(i => min(seededHash(col("h0"), i)).as(s"m$i"))
    val sigs = ex.groupBy(col("doc_id"))
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
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

  /** §2#27 SimHash near-dup: 64-bit signatures (64 codegen'd per-bit
    * vote-sum aggregates over exploded token hashes), Hamming
    * distance ≤ 8 between a doc and its planted variant block. */
  def simhash(spark: SparkSession, sfDir: String): DataFrame = {
    val hashes = corpusWithPlants(spark, sfDir)
      .select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
    val voteAggs = (0 until 64).map(j => sum(simhashVote(col("h"), j)).as(s"b$j"))
    val sigs = hashes.groupBy(col("doc_id"))
      .agg(voteAggs.head, voteAggs.tail: _*)
      .select(col("doc_id"), (col("doc_id") % 1000000L).as("block"),
        simhashFromVotes(j => col(s"b$j")).as("sig"))
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
    graft.functions.Registry.ensure(spark)
    val base = Tables.embeddingsPar(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
    val plants = base.where(col("vec_id") < 100)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("label"), col("emb"))
    // per-vector norm computed once, not per pair (same FP ops as the
    // oracle's dot/(sqrt(aa)*sqrt(bb)) — just hoisted)
    val corpus = base.unionByName(plants).withColumn("nrm", norm2(col("emb")))
    corpus.as("x").join(corpus.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"),
        scaled(dot(col("x.emb"), col("y.emb")) / (col("x.nrm") * col("y.nrm")),
          1000000L).as("cos_e6"))
      .where(col("cos_e6") >= 950000L)
      .orderBy(col("vec_a"), col("vec_b"))
  }
}
