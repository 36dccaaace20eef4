package graft.operators

import graft.SparkSuite

/** Randomized ground-truth check for §2#216/#217: on small corpora the
  * whole BPE trainer is computable directly — word counts, pair counts,
  * argmax under (count DESC, pair ASC), EXACT greedy left-to-right
  * merge per round — so the operator (which applies merges via the
  * double-spaced literal-replace encoding) must agree round for round.
  * Small alphabets force repeated chars, shared-boundary overlaps
  * ("a a a"), ties, and compositional merges (merged symbols merging
  * again) — exactly the cases where a naive single-space replace
  * silently diverges from greedy. */
class BpeProps extends SparkSuite {
  import spark.implicits._

  /** Independent trainer over (word → count). */
  private def truth(docs: Seq[String], k: Int)
      : (Seq[(String, String, Long)], Map[String, Int]) = {
    var vocab: Map[String, (Seq[String], Long)] = docs
      .flatMap(_.trim.split("\\s+"))
      .groupBy(identity)
      .map { case (w, g) => w -> (w.split("").toSeq, g.size.toLong) }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var r = 0
    var break = false
    while (r < k && !break) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.values.foreach { case (syms, n) =>
        syms.lazyZip(syms.drop(1)).foreach((a, b) =>
          counts((a, b)) = counts.getOrElse((a, b), 0L) + n)
      }
      if (counts.isEmpty) break = true
      else {
        val ((x, y), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((x, y, cnt))
        vocab = vocab.map { case (w, (syms, n)) =>
          val out = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.size) {
            if (i + 1 < syms.size && syms(i) == x && syms(i + 1) == y) {
              out += x + y; i += 2
            } else { out += syms(i); i += 1 }
          }
          w -> (out.toSeq, n)
        }
        r += 1
      }
    }
    (merges.toSeq, vocab.map { case (w, (syms, _)) => w -> syms.size })
  }

  test("random corpora: trainer and encoder equal the direct greedy implementation") {
    val rnd = new scala.util.Random(11)
    (1 to 5).foreach { trial =>
      val alphabet = "ab" + ("cdefg".take(1 + rnd.nextInt(4)))
      val words = (1 to 6 + rnd.nextInt(8)).map(_ =>
        (1 to 1 + rnd.nextInt(6))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val docs = (1L to (3 + rnd.nextInt(4)).toLong).map { id =>
        id -> (1 to 3 + rnd.nextInt(25))
          .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
      }
      val k = 4 + rnd.nextInt(4)
      val (expMerges, expSyms) = truth(docs.map(_._2), k)
      val df = docs.toDF("doc_id", "text")
      val gotMerges = TextAnalysis.bpeMergesOf(df, k)._1
        .map(m => (m._2, m._3, m._5))
      assert(gotMerges === expMerges, s"trial $trial: merge tables differ")
      // encode: per-doc symbol count under the trained merges
      val gotEnc = TextAnalysis.bpeEncodeOf(df, k).collect()
        .map(r => r.getLong(0) -> r.getLong(3)).toMap
      docs.foreach { case (id, text) =>
        val expN = text.trim.split("\\s+").map(expSyms).sum.toLong
        assert(gotEnc(id) === expN, s"trial $trial doc $id: n_syms")
      }
    }
  }

  test("k=64 with periodic lineage cuts equals the direct trainer (real merge depth)") {
    // published tokenizers run tens of thousands of merge rounds; the
    // chained per-round replace columns would nest the projection 64
    // deep without the cutEvery checkpoint. Run a corpus rich enough
    // to sustain 64 merges and pin the FULL merge table and encode
    // against the direct greedy implementation — proving the periodic
    // cut (every 8 rounds → 8 cuts here) is value-neutral at depth.
    val rnd = new scala.util.Random(64)
    val alphabet = "abcdefghij"
    val words = (1 to 40).map(_ =>
      (1 to 3 + rnd.nextInt(8))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val docs = (1L to 8L).map { id =>
      id -> (1 to 30 + rnd.nextInt(30))
        .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    }
    val (expMerges, expSyms) = truth(docs.map(_._2), 64)
    assert(expMerges.size === 64, s"corpus too small: ${expMerges.size} merges")
    val df = docs.toDF("doc_id", "text")
    val gotMerges = TextAnalysis.bpeMergesOf(df, 64)._1
      .map(m => (m._2, m._3, m._5))
    assert(gotMerges === expMerges, "k=64 merge tables differ")
    val gotEnc = TextAnalysis.bpeEncodeOf(df, 64).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    docs.foreach { case (id, text) =>
      val expN = text.trim.split("\\s+").map(expSyms).sum.toLong
      assert(gotEnc(id) === expN, s"doc $id: n_syms at k=64")
    }
  }

  test("shared-boundary overlap merges exactly greedily (a a a → [aa, a])") {
    // the construction where single-space replace diverges: 'aaa' as
    // chars [a,a,a] under merge (a,a) must become [aa, a], and
    // 'aaaa' → [aa, aa]
    val df = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val (merges, cur) = TextAnalysis.bpeMergesOf(df, 1)
    assert(merges.head._2 === "a" && merges.head._3 === "a")
    // aaa: 2 adjacent pairs, aaaa: 3 → weighted count 5 per word count 1
    assert(merges.head._5 === 5L)
    val syms = cur.select("tok", "s").collect()
      .map(r => r.getString(0) -> r.getString(1).trim.split("  ").toSeq).toMap
    assert(syms("aaa") === Seq("aa", "a"))
    assert(syms("aaaa") === Seq("aa", "aa"))
  }
}
