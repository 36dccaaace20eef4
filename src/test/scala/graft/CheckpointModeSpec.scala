package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `spark.graft.checkpoint.dir` selects reliable `.checkpoint()` for
  * the iterative operators' per-round lineage cuts (Checkpoints.cut);
  * unset keeps eager localCheckpoint. Kill-survivability can't be
  * exercised at local[32] (no executor to lose), so the pin here is
  * the contract that CAN be tested: both modes return bit-identical
  * rows for the three iterative families (PageRank fixpoint, CC label
  * propagation, Lloyd's k-means path via IVF), and reliable mode
  * actually writes its blocks under the configured directory. */
class CheckpointModeSpec extends AnyFunSuite with SparkSuite {

  private def withReliable[A](body: => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try body
    finally {
      spark.conf.unset("spark.graft.checkpoint.dir")
      // the spec asserts usage before cleanup; best-effort delete
      val root = new java.io.File(dir)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
  }

  private def edges = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (7L, 8L))
      .toDF("doc_a", "doc_b")
  }

  test("pagerank: reliable checkpoint mode is row-identical to local mode") {
    val local = operators.Graph.pagerankFrom(edges).collect().toSeq
    val reliable = withReliable {
      val rows = operators.Graph.pagerankFrom(edges).collect().toSeq
      assert(spark.sparkContext.getCheckpointDir.isDefined,
        "reliable mode must install the checkpoint dir")
      rows
    }
    assert(reliable === local)
  }

  test("cluster (CC label prop): reliable mode is row-identical to local mode") {
    val docs = edges.select(col("doc_a").as("doc_id"))
      .unionByName(edges.select(col("doc_b").as("doc_id"))).distinct()
    val local = operators.Dedup.clusterFrom(edges, docs).collect().toSeq
    val reliable = withReliable {
      operators.Dedup.clusterFrom(edges, docs).collect().toSeq
    }
    assert(reliable === local)
  }

  test("k-means (ivf_kmeans path): reliable mode is row-identical to local mode") {
    val local = operators.Similarity.ivfKmeansTopk(spark, sf).collect().toSeq
    val reliable = withReliable {
      operators.Similarity.ivfKmeansTopk(spark, sf).collect().toSeq
    }
    assert(reliable === local)
  }

  test("reliable mode writes checkpoint files under the configured dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-files")
    spark.conf.set("spark.graft.checkpoint.dir", dir.toString)
    try {
      operators.Graph.kcoreFrom(edges, 2).collect()
      def count(f: java.io.File): Int =
        if (f.isFile) 1
        else Option(f.listFiles()).map(_.map(count).sum).getOrElse(0)
      assert(count(dir.toFile) > 0,
        s"no checkpoint files written under $dir")
    } finally spark.conf.unset("spark.graft.checkpoint.dir")
  }
}
