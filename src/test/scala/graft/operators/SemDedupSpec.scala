package graft.operators

import graft.SparkSuite

/** Structural contract for dedup_semantic (SemDeDup, §2#119). The
  * k-means centroids are float averages, so exact output values are
  * engine-specific (rows-only in the driver gate); what must ALWAYS
  * hold, regardless of clustering outcome:
  *
  *   - one verdict row per corpus vector (500 base + 100 plants);
  *   - every planted exact copy is dropped: identical vectors share a
  *     cell and tie on cos-to-centroid, so the original (lower vec_id)
  *     dominates its plant under the tie-break (the original itself
  *     may additionally be dropped by a third dominator — that's
  *     correct dedup, not a double-drop of the pair's content, and is
  *     not asserted either way);
  *   - kept/dropped is a partition (kept ∈ {0,1});
  *   - at least every plant is dropped, and something is kept.
  */
class SemDedupSpec extends SparkSuite {

  test("dedup_semantic: plants dropped, one verdict per vector, kept partition") {
    val rows = Dedup.semantic(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // one row per corpus vector, ids unique
    assert(rows.length === 600)
    assert(rows.map(_._1).distinct.length === 600)

    val kept = rows.map(r => r._1 -> r._4).toMap
    assert(kept.values.forall(v => v == 0L || v == 1L))

    // every planted copy (vec_id >= 1e6) is a dup of its original and
    // must be dropped; within each (original, plant) pair the plant is
    // the dropped one (tie-break on vec_id)
    val plants = rows.filter(_._1 >= 1000000L)
    assert(plants.length === 100)
    assert(plants.forall(_._4 == 0L), "a planted exact copy survived")

    // drop counts: at least the 100 plants; and the op must keep data
    val nDropped = rows.count(_._4 == 0L)
    assert(nDropped >= 100)
    assert(rows.count(_._4 == 1L) > 0)

    // plant and original share a cell (identical vectors, same argmax)
    val cellOf = rows.map(r => r._1 -> r._2).toMap
    (0L until 100L).foreach { v =>
      assert(cellOf(v) === cellOf(v + 1000000L),
        s"vec $v and its exact copy landed in different cells")
    }

    // identical vectors have identical cos-to-centroid
    val ccOf = rows.map(r => r._1 -> r._3).toMap
    (0L until 100L).foreach { v =>
      assert(ccOf(v) === ccOf(v + 1000000L))
    }
  }
}
