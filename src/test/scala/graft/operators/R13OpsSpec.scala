package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Specs for the round-13 additions: n-gram novelty, curriculum
  * buckets, candidate-graph degree. */
class R13OpsSpec extends SparkSuite {
  import spark.implicits._

  test("text_ngram_novelty: min-doc_id attribution on hand-built docs") {
    val docs = Seq(
      (1L, "a b c d"),       // "a b c","b c d" — both first here
      (2L, "a b c d"),       // exact dup of 1 — nothing novel
      (3L, "c d e f"),       // "c d e","d e f" — both novel
      (4L, "a b c x y z"))   // "a b c" seen; "b c x","c x y","x y z" novel
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNoveltyOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) === ((2L, 2L, 1000L)))
    assert(got(2L) === ((2L, 0L, 0L)))
    assert(got(3L) === ((2L, 2L, 1000L)))
    assert(got(4L) === ((4L, 3L, 750L)))
  }

  test("text_ngram_novelty: per-doc shingle counts match the shingle builder") {
    // the explode→count path must agree with size(array_distinct(...))
    // computed narrowly per row — same hash family, no corpus interaction
    val out = TextAnalysis.ngramNovelty(spark, sf)
    val direct = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), size(array_distinct(
        graft.functions.Fns.shingleMd5HashesOrdered(
          graft.functions.Fns.tokens(col("text")), 3))).cast("long").as("n"))
    val joined = out.join(direct, "doc_id")
      .where(col("n_shingles") =!= col("n")).count()
    assert(joined === 0L)
    // novelty is a per-mille: every row in [0, 1000], novel ≤ total
    assert(out.where(col("novelty_pm") < 0 || col("novelty_pm") > 1000 ||
      col("n_novel") > col("n_shingles")).count() === 0L)
  }

  test("sample_curriculum: bands partition the corpus, cum is the from-top suffix sum") {
    val rows = Sampling.sampleCurriculum(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum === nDocs, "bands must partition the corpus")
    rows.foreach { case (b, _, _, minPm, maxPm, _) =>
      assert(b >= 0 && b <= 9)
      assert(minPm >= b * 100, s"bucket $b min $minPm below band floor")
      val cap = if (b == 9) 1000L else b * 100 + 99
      assert(maxPm <= cap, s"bucket $b max $maxPm above band cap")
    }
    // cum_tokens_from_top(b) = Σ n_tokens over buckets ≥ b
    rows.foreach { case (b, _, _, _, _, cum) =>
      val want = rows.filter(_._1 >= b).map(_._3).sum
      assert(cum === want, s"bucket $b cum $cum != suffix sum $want")
    }
  }

  test("graph_degree_dist: handshake identity and degree-0 coverage") {
    val deg = Graph.degreeDist(spark, sf)
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(deg.count() === nDocs, "one row per document, degree-0 included")
    val pairs = Dedup.candidatePairs(spark, sf)
    val sumDeg = deg.agg(sum(col("degree"))).head.getLong(0)
    assert(sumDeg === 2 * pairs.count(), "sum of degrees = 2|E| (handshake)")
    // every endpoint of a pair has degree >= 1
    val zeroEndpoints = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct()
      .join(deg.where(col("degree") === 0), "doc_id").count()
    assert(zeroEndpoints === 0L)
  }
}
