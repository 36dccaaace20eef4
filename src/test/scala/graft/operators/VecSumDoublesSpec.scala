package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Fns, Registry, VecSumDoubles}
import graft.functions.Fns._

/** Focused spec for the r17 optimization internals: the element-wise
  * vector-sum aggregate ([[VecSumDoubles]]) and its consumers'
  * contract — the single-pass centroid recompute must agree with the
  * posexplode/avg reference it replaced, and the per-row broadcast
  * argmax must pick the same cell as the corpus-wide max_by form. */
class VecSumDoublesSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("vecsum-spec").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Registry.ensure(s)
    s
  }

  private def df(rows: Seq[(Long, Seq[Double])]) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  test("vecSum matches the posexplode/sum reference elementwise") {
    val rows = (0 until 97).map(i =>
      (i.toLong % 5, Seq.tabulate(8)(d => (i * 31 + d * 7 % 13) / 7.0)))
    val got = df(rows).groupBy(col("k"))
      .agg(vecSum(col("v")).as("vs"), count(lit(1)).as("n"))
      .select(col("k"), col("vs"), col("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toVector, r.getLong(2))).toMap
    // reference: exploded per-dim sums (order-insensitive here: the
    // test values are small integers over 7.0, exactly representable
    // sums at this count, so association cannot change the total)
    val ref = rows.groupBy(_._1).map { case (k, g) =>
      k -> (Vector.tabulate(8)(d => g.map(_._2(d)).sum), g.size.toLong)
    }
    assert(got.keySet === ref.keySet)
    for (k <- ref.keySet) {
      assert(got(k)._2 === ref(k)._2, s"count mismatch for group $k")
      (got(k)._1, ref(k)._1).zipped.foreach((a, b) =>
        assert(math.abs(a - b) < 1e-9, s"sum mismatch for group $k"))
    }
  }

  test("vecSum skips nulls and survives partition merge") {
    import spark.implicits._
    val rows = Seq((1L, Seq(1.0, 2.0)), (1L, null), (1L, Seq(3.0, 4.0)))
      .toDF("k", "v").repartition(4) // force merge of empty partials
    val r = rows.groupBy(col("k"))
      .agg(vecSum(col("v")).as("vs"), count(col("v")).as("n"))
      .collect().head
    assert(r.getSeq[Double](1) === Seq(4.0, 6.0))
    assert(r.getLong(2) === 2L)
  }

  test("vecSum of an all-null group is null") {
    import spark.implicits._
    val rows = Seq((1L, null: Seq[Double])).toDF("k", "v")
    val r = rows.groupBy(col("k")).agg(vecSum(col("v")).as("vs")).collect().head
    assert(r.isNullAt(1))
  }

  test("per-row broadcast argmax picks the same cell as the max_by form") {
    import spark.implicits._
    // corpus + centroids with engineered ties: cells 0 and 1 share a
    // centroid, so the (cell_cos, -cell) tie-break is exercised
    val base = (0 until 40).map { i =>
      (i.toLong, Seq.tabulate(4)(d => ((i * 13 + d * 5) % 11 - 5).toDouble))
    }.toDF("vec_id", "emb").withColumn("nrm", norm2(col("emb")))
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)),
      (1L, Seq(1.0, 0.0, 0.0, 0.0)), // duplicate of cell 0 → tie
      (2L, Seq(0.0, 1.0, 0.0, 0.0)),
      (3L, Seq(0.0, 0.0, -1.0, 1.0))).toDF("cell", "c_emb")
      .withColumn("c_nrm", norm2(col("c_emb")))
    val viaMaxBy = base.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        Similarity.cosPre(col("emb"), col("nrm"),
          col("c_emb"), col("c_nrm")).as("cc"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cell"), struct(col("cc"), -col("cell"))).as("cell"))
    val viaArray = base
      .crossJoin(broadcast(Similarity.centsAsArray(cents)))
      .select(col("vec_id"),
        Similarity.bestCellStruct(col("emb"), col("nrm"))
          .getField("cell").as("cell"))
    val a = viaMaxBy.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = viaArray.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    // the tie always resolves to the smaller cell id
    assert(b.values.forall(_ != 1L), "tie-break picked the larger cell")
  }
}
