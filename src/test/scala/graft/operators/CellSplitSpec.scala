package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import graft.functions.Fns.norm2

/** §2#301 `ann_cell_split` — the acted-on form of the #298/#299
  * rebuild hint. The strong property (r16 verdict #6b): splitting the
  * worst cell equals an INDEPENDENT batch 2-means re-cluster of
  * exactly that cell's population — and nothing else moves:
  *
  *   - untouched cells carry the same (n_vecs, mean_resid_e6) the
  *     pre-split health report ([[Similarity.cellHealthOn]]) gave them;
  *   - the two children partition the parent's population, carry
  *     fresh ids (max + 1, max + 2) and the parent's id, and match the
  *     stats of re-running [[Similarity.kmeansCentroids]] (k = 2) over
  *     the same population;
  *   - mass is conserved.
  */
class CellSplitSpec extends SparkSuite {
  import spark.implicits._

  private def vecs(rows: Seq[(Long, Array[Double])]) = {
    graft.functions.Registry.ensure(spark)
    rows.toDF("vec_id", "emb")
      .withColumn("emb", col("emb").cast("array<double>"))
      .withColumn("nrm", norm2(col("emb")))
  }

  private def centroids(rows: Seq[(Long, Array[Double])]) = {
    graft.functions.Registry.ensure(spark)
    rows.toDF("cell", "c_emb")
      .withColumn("c_emb", col("c_emb").cast("array<double>"))
      .withColumn("c_nrm", norm2(col("c_emb")))
  }

  // cell 0 holds TWO directional sub-populations (≈3° and ≈39° off the
  // axis) — a badly-fitting centroid; cell 1 holds one tight ≈90°
  // population. The worst-cell pick must choose 0 and 2-means must
  // separate the sub-populations.
  private val subA = (0L until 10L).map(i => (i, Array(1.0, 0.05 + 0.001 * i)))
  private val subB = (10L until 20L).map(i => (i, Array(1.0, 0.80 + 0.001 * (i - 10))))
  private val tight = (20L until 30L).map(i => (i, Array(0.01 * (i - 20), 1.0)))
  private val twoCells = Seq((0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))

  test("worst cell split: untouched cells keep their health, children partition the parent") {
    val base = vecs(subA ++ subB ++ tight)
    val cs = centroids(twoCells)
    val preHealth = Similarity.cellHealthOn(base, cs).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("mean_resid_e6")))).toMap
    assert(preHealth(0L)._1 === 20L && preHealth(1L)._1 === 10L)

    val out = Similarity.cellSplitOn(base, cs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // untouched cell 1: parent −1, exactly the pre-split verdict
    val untouched = out.filter(_._4 == -1L)
    assert(untouched.map(_._1).toSeq === Seq(1L))
    assert(untouched.head._2 === preHealth(1L)._1)
    assert(untouched.head._3 === preHealth(1L)._2)

    // children: fresh ids max+1/max+2, parent 0, clean 10/10 split of
    // the parent's 20 vectors, better fit than the parent had
    val children = out.filter(_._4 != -1L)
    assert(children.map(_._1).sorted.toSeq === Seq(2L, 3L))
    assert(children.forall(_._4 == 0L))
    assert(children.map(_._2).sum === 20L)
    assert(children.map(_._2).sorted.toSeq === Seq(10L, 10L))
    assert(children.forall(_._3 < preHealth(0L)._2),
      s"a child fits worse than the unsplit parent: ${children.toSeq}")

    // mass conservation
    assert(out.map(_._2).sum === 30L)
  }

  test("children equal an independent batch 2-means re-cluster of the same cell") {
    val base = vecs(subA ++ subB ++ tight)
    val cs = centroids(twoCells)
    val out = Similarity.cellSplitOn(base, cs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val children = out.filter(_._4 != -1L)
      .map(t => t._1 -> ((t._2, t._3))).toMap

    // the independent re-cluster: the SAME population (cell 0's
    // members by construction), the same Lloyd's (k = 2, default
    // iters), child ids shifted exactly like the operator shifts them
    // (max cell id 1 → +2); its health report must equal the
    // operator's child rows
    val pop = vecs(subA ++ subB)
    val kc = Similarity.kmeansCentroids(pop, 2, 2)
      .select((col("cell") + 2L).as("cell"), col("c_emb"), col("c_nrm"))
    val recluster = Similarity.cellHealthOn(pop, kc).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("mean_resid_e6")))).toMap

    assert(recluster.keySet === children.keySet)
    recluster.foreach { case (cell, (n, mean)) =>
      assert(children(cell)._1 === n,
        s"child $cell count: operator ${children(cell)._1} vs re-cluster $n")
      assert(children(cell)._2 === mean,
        s"child $cell mean resid: operator ${children(cell)._2} vs re-cluster $mean")
    }
  }

  test("sf corpus: one row per surviving cell, mass conserved, two fresh children") {
    val out = Similarity.cellSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val emb = graft.Tables.embeddingsPar(spark, sf)
    val nVecs = emb.count()
    val labels = emb.select(col("label").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet

    assert(out.map(_._2).sum === nVecs)
    val children = out.filter(_._4 != -1L)
    assert(children.length === 2)
    assert(children.map(_._4).distinct.length === 1)
    val parent = children.head._4
    assert(labels.contains(parent))
    assert(children.forall(_._1 > labels.max))
    val untouched = out.filter(_._4 == -1L).map(_._1).toSet
    assert(untouched === (labels - parent))
  }
}
