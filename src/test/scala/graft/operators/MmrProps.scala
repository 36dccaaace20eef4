package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the pure MMR greedy (§2#167) over random
  * candidate sets: structural guarantees (size, distinctness,
  * rank-1 = argmax relevance), the λ=1 reduction to plain top-k, and
  * input-order invariance (the fold canonicalizes before selecting —
  * shuffle-order from the cluster can never change the answer). */
object MmrProps extends Properties("MmrSelect") {

  private val dim = 4

  private val cand: Gen[(Long, Long, Seq[Double], Double)] = for {
    id <- Gen.chooseNum(0L, 50L)
    vecRaw <- Gen.listOfN(dim, Gen.chooseNum(-5, 5))
  } yield {
    // avoid the zero vector (undefined cosine); nrm as the op computes
    val vec = if (vecRaw.forall(_ == 0)) List(1, 0, 0, 0) else vecRaw
    val emb = vec.map(_.toDouble)
    var d = 0.0; var i = 0
    while (i < emb.length) { d += emb(i) * emb(i); i += 1 }
    // rel_e6 derived from the first coord so relevance is arbitrary
    // but fixed per candidate
    (id, vec.head.toLong * 100000L, emb, math.sqrt(d))
  }

  /** Distinct ids (the operator's candidates are distinct neighbors). */
  private val cands: Gen[Array[(Long, Long, Seq[Double], Double)]] =
    Gen.listOf(cand).map(_.groupBy(_._1).values.map(_.head).toArray)

  private val kGen: Gen[Int] = Gen.chooseNum(1, 6)
  private val lambda: Gen[Long] = Gen.chooseNum(0L, 1000L)

  property("size = min(k, n); ids distinct; ranks contiguous") =
    forAll(cands, kGen, lambda) { (cs, k, lam) =>
      val out = Similarity.mmrSelect(cs, k, lam)
      out.size == math.min(k, cs.length) &&
        out.map(_._2).distinct.size == out.size &&
        out.map(_._1) == (1L to out.size.toLong)
    }

  // NOT "max raw relevance": rank-1's score is floorDiv(λ·rel, 1000),
  // which collapses relevances λ can't separate (λ=0 collapses ALL of
  // them) — the theorem is argmax of the λ-scaled score, ties by id
  property("rank 1 maximizes the λ-scaled relevance (ties by id)") =
    forAll(cands, kGen, lambda) { (cs, k, lam) =>
      cs.isEmpty || {
        val best = cs.minBy(t => (-Math.floorDiv(lam * t._2, 1000L), t._1))
        Similarity.mmrSelect(cs, k, lam).head._2 == best._1
      }
    }

  property("λ=1000 reduces to plain top-k by (rel desc, id)") =
    forAll(cands, kGen) { (cs, k) =>
      val plain = cs.sortBy(t => (-t._2, t._1)).take(k).map(_._1).toSeq
      Similarity.mmrSelect(cs, k, 1000L).map(_._2) == plain
    }

  property("input order never changes the selection") =
    forAll(cands, kGen, lambda, Gen.chooseNum(0, 1000)) { (cs, k, lam, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(cs.toList).toArray
      Similarity.mmrSelect(shuffled, k, lam) == Similarity.mmrSelect(cs, k, lam)
    }
}
