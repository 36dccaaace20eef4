package graft.operators

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.functions._

/** §2#185 + VERDICT r9 item 2: hot-shingle behavior of the candidate
  * join, measured on a crafted SKEWED corpus (one ubiquitous
  * boilerplate phrase in every doc) — the known cost SURVEY §8 flags.
  * Losslessness of the PPJoin prefix filter is pinned against the
  * unfiltered join on the real corpus; boundedness is pinned by exact
  * candidate COUNTS (deterministic, unlike wall-clock): linear growth
  * under 10× corpus growth where the naive join grows ~100×. */
class PrefixFilterSpec extends SparkSuite {

  /** `n` docs that all share a 12-token boilerplate phrase (hot
    * shingles with df = n) plus per-doc unique filler, with
    * `nPlanted` near-dup pairs whose unique blocks are identical —
    * the only pairs with jaccard ≥ 0.5. Written parquet-shaped like
    * documents.parquet so the production loaders read it. */
  private def writeSkewed(n: Int, nPlanted: Int): String = {
    val boiler = "terms of service apply to all content on this site please read"
    def uniq(seed: Int) =
      (0 until 30).map(j => s"u${seed}w$j").mkString(" ")
    val rows = (0 until n).map { i =>
      // planted pairs: docs (2k, 2k+1) for k < nPlanted share one block
      val seed = if (i < 2 * nPlanted) i / 2 else 1000 + i
      (i.toLong, s"$boiler ${uniq(seed)}", "en", "web", 0L)
    }
    val dir = Files.createTempDirectory(s"skew-$n").toString
    spark.createDataFrame(rows).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("prefix filter is lossless at the threshold on the real corpus") {
    val viaPrefix = Dedup.jaccardPrefix(spark, sf, 500).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val unfiltered = Dedup.ngramJaccard(spark, sf, Int.MaxValue)
      .where(col("inter_n") * 1000 >= lit(500L) * col("union_n")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaPrefix === unfiltered)
    assert(viaPrefix.nonEmpty, "threshold corpus fixture went empty")
  }

  test("skewed corpus: prefix join admits only real near-dups; df-cap join stays bounded; naive blows up df²") {
    val n = 120
    val dir = writeSkewed(n, nPlanted = 3)
    // the naive unfiltered join pairs every doc with every doc through
    // the boilerplate shingles: C(120,2) candidates
    val naive = Dedup.ngramJaccard(spark, dir, maxDf = Int.MaxValue).count()
    assert(naive === n.toLong * (n - 1) / 2,
      "fixture broken: the hot phrase should pair all docs")
    // df cap well below the hot df: hot shingles dropped, candidates
    // collapse to pairs sharing UNIQUE shingles = the planted dups
    val capped = Dedup.ngramJaccard(spark, dir, maxDf = 16).count()
    assert(capped === 3L, s"df-capped candidates not bounded: $capped")
    // PPJoin prefix at t=0.5: hot shingles rank last in every doc's
    // global-rarity order and never enter the prefix, so candidates =
    // planted pairs only — and NOTHING was dropped from scoring
    val ex = graft.Tables.documentsPar(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(graft.functions.Fns.shingleHashes(
          graft.functions.Fns.tokens(col("text")), 3)).as("sh8"))
    assert(Dedup.prefixCandidates(ex, 500).count() === 3L)
    val found = Dedup.jaccardPrefix(spark, dir, 500).collect()
    assert(found.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((0L, 1L), (2L, 3L), (4L, 5L)))
    // exact over the FULL universe: identical unique blocks + shared
    // boilerplate = identical shingle sets = jaccard 1000‰
    assert(found.forall(_.getAs[Long]("jaccard_pm") === 1000L))
  }

  test("property: prefix == brute force at the threshold on randomized corpora (same-source AND global)") {
    // random docs over a small shared vocab (dense borderline overlap)
    // + planted one-token-appended near-dups (guaranteed qualifying
    // pairs) — the lossless claim checked against brute force, not a
    // fixture the filter was tuned on
    val rnd = new scala.util.Random(0xD00D)
    val rows = (0 until 120).map { i =>
      val toks =
        if (i % 4 == 3) {
          val prev = docTokens(i - 1, rnd) // near-dup of the previous doc
          prev :+ "extra"
        } else docTokens(i, rnd)
      (i.toLong, toks.mkString(" "), "en",
        if (i % 3 == 0) "a" else "b", 0L)
    }
    def writeAs(src: Option[String]): String = {
      val dir = java.nio.file.Files.createTempDirectory("pfx-prop").toString
      spark.createDataFrame(rows.map { case (id, t, l, s, n) =>
        (id, t, l, src.getOrElse(s), n) })
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    val dir = writeAs(None)
    val flat = writeAs(Some("x")) // same docs, one source = global truth

    def collectPairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val thresholded = (d: String) => Dedup.ngramJaccard(spark, d, Int.MaxValue)
      .where(col("inter_n") * 1000 >= lit(500L) * col("union_n"))
      .select(col("doc_a"), col("doc_b"), col("inter_n"), col("union_n"))

    val sameSrc = collectPairs(Dedup.jaccardPrefix(spark, dir, 500)
      .select(col("doc_a"), col("doc_b"), col("inter_n"), col("union_n")))
    assert(sameSrc === collectPairs(thresholded(dir)))
    assert(sameSrc.nonEmpty, "random fixture produced no qualifying pairs")

    val global = collectPairs(Dedup.jaccardGlobal(spark, dir, 500)
      .select(col("doc_a"), col("doc_b"), col("inter_n"), col("union_n")))
    assert(global === collectPairs(thresholded(flat)))
    assert(global.size >= sameSrc.size, "global must see every same-source pair")
  }

  // deterministic per-doc token stream: the SAME tokens regardless of
  // call order, so near-dup planting can re-derive its neighbor
  private def docTokens(i: Int, unused: scala.util.Random): Vector[String] = {
    val r = new scala.util.Random(1234 + i)
    val n = 8 + r.nextInt(22)
    Vector.fill(n)(s"w${r.nextInt(40)}")
  }

  test("10x skewed growth: prefix/df-cap candidates grow linearly while the naive join grows ~100x") {
    val small = writeSkewed(60, nPlanted = 2)
    val big = writeSkewed(600, nPlanted = 20)
    val cappedSmall = Dedup.ngramJaccard(spark, small, maxDf = 16).count()
    val cappedBig = Dedup.ngramJaccard(spark, big, maxDf = 16).count()
    assert(cappedSmall === 2L && cappedBig === 20L,
      s"df-capped candidates must track planted dups: $cappedSmall -> $cappedBig")
    val naiveSmall = Dedup.ngramJaccard(spark, small, maxDf = Int.MaxValue).count()
    val naiveBig = Dedup.ngramJaccard(spark, big, maxDf = Int.MaxValue).count()
    assert(naiveSmall === 60L * 59 / 2 && naiveBig === 600L * 599 / 2,
      "naive candidate growth should be quadratic in the corpus")
    assert(naiveBig > 100L * cappedBig,
      "the whole point: bounded vs quadratic at 10x")
  }
}
