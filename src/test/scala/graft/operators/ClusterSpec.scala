package graft.operators

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
