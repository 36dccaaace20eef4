package graft.operators

import graft.SparkSuite

/** Randomized ground-truth check for §2#214/#215: on small corpora the
  * duplicated-window set is computable by direct token-sequence
  * counting (no hashing), so the operator — which uses 2^31 polynomial
  * hashes — must agree exactly (collision odds at this corpus size are
  * ~10⁻⁶ per run and the seed is fixed, so a disagreement means a real
  * bug, not hash luck). Covers window counting, the interval union,
  * and the scrub complement, against an independent implementation. */
class SubstringDedupProps extends SparkSuite {
  import spark.implicits._

  private val w = 3

  private def truth(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }.toMap
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    toks.values.foreach { ts =>
      ts.sliding(w).filter(_.size == w).foreach(win =>
        counts(win) = counts.getOrElse(win, 0) + 1)
    }
    toks.map { case (id, ts) =>
      val starts = ts.sliding(w).zipWithIndex
        .collect { case (win, i) if win.size == w && counts(win) >= 2 => i }
        .toSeq
      val covered = starts.flatMap(s => s until s + w).distinct.size
      id -> (ts.size.toLong, starts.size.toLong, covered.toLong)
    }
  }

  test("random corpora: operator output equals direct token-sequence counting") {
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { trial =>
      val vocabSize = 4 + rnd.nextInt(6) // small vocab forces repeats
      val docs = (1L to (4 + rnd.nextInt(5)).toLong).map { id =>
        val n = 2 + rnd.nextInt(20)
        id -> (1 to n).map(_ => s"t${rnd.nextInt(vocabSize)}").mkString(" ")
      }
      val expect = truth(docs)
      val got = TextAnalysis.substringDedupOf(docs.toDF("doc_id", "text"), w)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got.keySet === expect.keySet, s"trial $trial: doc sets differ")
      expect.foreach { case (id, (n, nw, cov)) =>
        val (gn, gw, gcov) = got(id)
        assert(gn === n, s"trial $trial doc $id: n_tokens $gn vs $n")
        assert(gw === nw, s"trial $trial doc $id: dup windows $gw vs $nw")
        assert(gcov === cov, s"trial $trial doc $id: covered $gcov vs $cov")
      }
      // scrub complement on the same corpus
      val scrub = TextAnalysis.substringScrubOf(docs.toDF("doc_id", "text"), w)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      expect.foreach { case (id, (n, _, cov)) =>
        assert(scrub(id) === n - cov, s"trial $trial doc $id: kept mismatch")
      }
    }
  }
}
