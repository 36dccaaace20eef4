package graft.operators
// (Graph/PageRank spec lives alongside the CC spec — same edge source)

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSuite {

  test("dedup clusters: labels are component minima and cover every doc") {
    val labels = Dedup.cluster(spark, sf).collect()
    assert(labels.length === 500)
    // cluster id is always <= member id (hash-min invariant)
    assert(labels.forall(r => r.getLong(1) <= r.getLong(0)))
    // every edge endpoint pair must share a cluster
    val labelMap = labels.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Dedup.ngramJaccard(spark, sf)
      .select(col("doc_a"), col("doc_b")).collect()
    assert(edges.forall(e => labelMap(e.getLong(0)) === labelMap(e.getLong(1))))
  }

  test("graph_pagerank equals a driver-side integer recompute; ranks order sensibly") {
    val iters = 6 // must match the operator default
    val got = Graph.pagerank(spark, sf, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recompute of the same integer fixpoint on collected edges
    val raw = Dedup.candidatePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bidir = raw ++ raw.map(_.swap)
    val out = bidir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val scale = 1000000000L
    var ranks = out.keys.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      out.foreach { case (src, dsts) =>
        val c = ranks(src) / dsts.length
        dsts.foreach(d => in(d) += c)
      }
      ranks = out.keys.map(v => v -> (15L * scale / 100L + 85L * in(v) / 100L)).toMap
    }
    assert(got === ranks)
    // a node with strictly more neighbors than another, all else equal,
    // accumulates rank: the global max degree node is above base rank
    val maxDegNode = out.maxBy(_._2.length)._1
    assert(got(maxDegNode) > 15L * scale / 100L)
  }

  test("cdc apply: delta rows win over base state for overlapping keys") {
    val merged = graft.cdc.Changefeed.applyChanges(spark, sf).collect()
    assert(merged.nonEmpty)
    val keys = merged.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.distinct.length === keys.length) // one winner per PK
    // any key with a delta-side change must surface the delta version
    val splitUs = java.sql.Timestamp.valueOf("2024-07-01 00:00:00").getTime * 1000
    merged.filter(_.getString(5) == "delta").foreach { r =>
      assert(r.getLong(3) >= splitUs)
    }
    merged.filter(_.getString(5) == "base").foreach { r =>
      assert(r.getLong(3) < splitUs)
    }
  }
}
