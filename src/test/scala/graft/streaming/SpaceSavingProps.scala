package graft.streaming

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property tests for the SpaceSaving fold (§2#170) against exact
  * counting, over arbitrary streams, capacities, and batch splits —
  * the published guarantees (Metwally et al., ICDT 2005, Thms 2-3)
  * checked mechanically:
  *   1. Σ counts = n (mass conservation — eviction redistributes,
  *      never loses).
  *   2. Per surviving item: true ≤ count ≤ true + err.
  *   3. Any item with true frequency > n/capacity is in the summary.
  *   4. distinct ≤ capacity ⇒ exact (err = 0, count = true, ALL items).
  *   5. Splitting one stream into arbitrary batches (the micro-batch
  *      boundary) never changes the final summary.
  */
object SpaceSavingProps extends Properties("SpaceSaving") {

  // skewed item universe so heavy hitters and churn both happen
  private val item: Gen[Long] = Gen.frequency(
    4 -> Gen.chooseNum(0L, 3L),     // few hot items
    2 -> Gen.chooseNum(4L, 20L),    // warm band
    2 -> Gen.chooseNum(21L, 500L))  // long tail
  private val stream: Gen[List[Long]] = Gen.listOf(item)
  private val capacity: Gen[Int] = Gen.chooseNum(1, 32)

  private def run(items: List[Long], cap: Int): Map[Long, (Long, Long)] =
    SpaceSaving.fold(
      scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)],
      items, cap).toMap

  property("mass conservation: sum of counts equals stream length") =
    forAll(stream, capacity) { (s, cap) =>
      run(s, cap).values.map(_._1).sum == s.length.toLong
    }

  property("per-item bound: true <= count <= true + err") =
    forAll(stream, capacity) { (s, cap) =>
      val truth = s.groupBy(identity).view.mapValues(_.length.toLong).toMap
      run(s, cap).forall { case (item, (count, err)) =>
        val t = truth(item)
        t <= count && count <= t + err
      }
    }

  property("guaranteed hitters: freq > n/capacity survives") =
    forAll(stream, capacity) { (s, cap) =>
      val truth = s.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val summary = run(s, cap)
      truth.forall { case (item, t) =>
        t * cap <= s.length.toLong || summary.contains(item)
      }
    }

  property("exact when distinct <= capacity") =
    forAll(stream) { s =>
      val truth = s.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val summary = run(s, truth.size.max(1))
      summary.size == truth.size &&
        truth.forall { case (item, t) => summary.get(item).contains((t, 0L)) }
    }

  property("batch boundaries are invisible: split fold == one fold") =
    forAll(stream, capacity, Gen.chooseNum(0, 10)) { (s, cap, cut) =>
      val whole = run(s, cap)
      val at = if (s.isEmpty) 0 else cut % (s.length + 1)
      val (a, b) = s.splitAt(at)
      val m = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
      SpaceSaving.fold(m, a, cap)
      SpaceSaving.fold(m, b, cap)
      m.toMap == whole
    }
}
