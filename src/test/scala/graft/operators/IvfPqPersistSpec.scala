package graft.operators

import graft.SparkSuite

/** §2#191: the build-once / query-many IVF-PQ split — a persisted
  * index answers exactly like the same stored index queried without
  * the storage optimizations, and the probed-cell partition predicate
  * actually reaches the code-table scan. */
class IvfPqPersistSpec extends SparkSuite {

  test("persisted index: identical answers, probed cells pruned at the scan") {
    val name = "ivfpq_spec_" + math.abs(this.hashCode())
    Similarity.persistIvfPqIndex(spark, sf, name)

    val persisted = Similarity.ivfPqTopkPersisted(spark, name)
    val got = persisted.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // the SAME stored tables, queried without the partition predicate —
    // parquet round-trips doubles exactly, so this must match row for row
    val idx = Similarity.persistedIvfPqIndex(spark, name)
    val direct = Similarity.ivfPqQuery(idx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === direct.toSeq,
      "partition-pruned query diverged from the unpruned one")

    // shape: k ranked rows per query, ranks 1..k
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._4).sorted.toSeq === (1L to rs.length))
      assert(rs.length <= 5)
    }
    assert(got.nonEmpty)

    // the probed-cell list must arrive at the code table as a STATIC
    // partition predicate — only the probed cells' directories are read
    val plan = persisted.queryExecution.executedPlan.toString
    val codesScan = raw"PartitionFilters: \[[^\]]*cell[^\]]*IN".r
    assert(codesScan.findFirstIn(plan).isDefined,
      s"no partition pruning on the codes scan:\n$plan")
  }
}
