package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Cross-job candidate-graph persistence (Dedup.persistCandidates):
  * the jaccard/containment/cluster/pagerank family must be able to
  * read the persisted bucketed graph INSTEAD of recomputing the
  * set-similarity join, with (a) identical results and (b) no shuffle
  * exchange on the bucketed key — the write-once/read-many shape that
  * makes the most expensive stage in the suite a per-snapshot cost
  * instead of a per-job cost at 100 TB. */
class CandidateGraphSpec extends SparkSuite {

  private def dropTables(): Unit = {
    spark.sql("DROP TABLE IF EXISTS cgtest_inter")
    spark.sql("DROP TABLE IF EXISTS cgtest_sizes")
    import scala.reflect.io.Directory
    new Directory(new java.io.File("spark-warehouse/cgtest_inter")).deleteRecursively()
    new Directory(new java.io.File("spark-warehouse/cgtest_sizes")).deleteRecursively()
    ()
  }

  test("persisted candidate graph: scores/cluster/pagerank match the memo path " +
      "and the bucketed key needs no exchange") {
    dropTables()
    Dedup.persistCandidates(spark, sf, name = "cgtest", buckets = 4)
    val (inter, sizes) = Dedup.persistedCandidates(spark, "cgtest")

    // --- result parity: every family member, persisted vs memo ---
    val jP = Dedup.ngramJaccardFrom(inter, sizes).collect().toSeq
    val jM = Dedup.ngramJaccard(spark, sf).collect().toSeq
    assert(jP === jM, "jaccard from the persisted graph must equal the memo path")

    val cP = Dedup.containmentFrom(inter, sizes).collect().toSeq
    val cM = Dedup.containment(spark, sf).collect().toSeq
    assert(cP === cM)

    val docs = graft.Tables.documentsPar(spark, sf).select(col("doc_id"))
    val pairs = inter.select(col("doc_a"), col("doc_b"))
    val clP = Dedup.clusterFrom(pairs, docs).collect().toSeq
    val clM = Dedup.cluster(spark, sf).collect().toSeq
    assert(clP === clM)

    val prP = Graph.pagerankFrom(pairs, iters = 3).collect().toSeq
    val prM = Graph.pagerank(spark, sf, iters = 3).collect().toSeq
    assert(prP === prM)

    // --- plan contract 1: an aggregate on the bucketed key reads the
    // bucketed scan's partitioning — no exchange anywhere in the plan
    val agg = inter.groupBy(col("doc_a")).agg(sum(col("inter_n")).as("s"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"groupBy(doc_a) over the bucketed inter table re-shuffled:\n$aggPlan")

    // --- plan contract 2: the jaccard doc_a-side join rides the
    // bucketing. Both tables have the SAME bucket count on their join
    // keys (doc_a / doc_id), so with broadcast off the SMJ plans with
    // NO exchange on either side; the doc_b join above it is the one
    // shuffle the scoring pays (doc_b is not the bucket key).
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val aJoin = inter.join(
        sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      val joinPlan = aJoin.queryExecution.executedPlan.toString
      assert(joinPlan.contains("SortMergeJoin") || joinPlan.contains("ShuffledHashJoin"))
      assert(!joinPlan.contains("Exchange hashpartitioning"),
        s"doc_a join over the bucketed pair should not re-shuffle:\n$joinPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)

    dropTables()
  }
}
