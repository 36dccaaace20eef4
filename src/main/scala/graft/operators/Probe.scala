package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch measurement harness for the r18 optimization round — NOT a
  * bench entry, deleted before the round ships. Times isolated stages
  * with the noop sink (guide §1.4). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      // warmup once, then min of 3 timed noop sinks
      spark.sparkContext.setJobDescription(s"probe: $name")
      mk.write.format("noop").mode("overwrite").save()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-40s ${ts.min}%8.3f s")
    }
    args.headOption.getOrElse("simhash") match {
      case "simhash" =>
        val docs = Dedup.corpusWithPlants(spark, sfDir)
        time("corpusWithPlants")(docs)
        time("simhashSigs")(Dedup.simhashSigs(docs))
        time("simhash full")(Dedup.simhash(spark, sfDir))
      case "banding" =>
        val sigs = Dedup.simhashSigs(Dedup.corpusWithPlants(spark, sfDir)).cache()
        val n = sigs.count()
        println(s"[probe] n sigs = $n")
        def collisions(sizes: Seq[Int], subset: Int): Unit = {
          val offs = sizes.scanLeft(0)(_ + _).init
          def block(i: Int) =
            shiftrightunsigned(col("sig"), offs(i))
              .bitwiseAND(lit((1L << sizes(i)) - 1))
          val combos = sizes.indices.combinations(subset).toSeq
          val keys = array(combos.zipWithIndex.map { case (c, pid) =>
            c.foldLeft(lit(pid.toLong)) { (acc, i) =>
              acc * lit(64L) + block(i) }
          }: _*)
          val cnts = sigs.select(explode(keys).as("bk"))
            .groupBy(col("bk")).count()
          val coll = cnts.agg(
            sum((col("count") * (col("count") - 1) / lit(2)).cast("long")).as("c"))
            .collect()(0).getLong(0)
          println(f"[probe] blocks=${sizes.size}%2d subset=$subset keys/doc=${combos.size}%4d rows=${n * combos.size}%9d collisions=$coll%12d")
        }
        collisions(Seq(7, 7, 7, 7, 6, 6, 6, 6, 6, 6), 2) // current
        collisions(Seq(6, 6, 6, 6, 6, 6, 6, 6, 6, 5, 5), 3) // 11-block triples
        collisions(Seq(6, 6, 6, 6, 5, 5, 5, 5, 5, 5, 5, 5), 4) // 12-block quads
        val dsig = sigs.select(col("sig")).distinct().cache()
        println(s"[probe] distinct sigs = ${dsig.count()}")
        val dOffs = Seq(7, 7, 7, 7, 6, 6, 6, 6, 6, 6).scanLeft(0)(_ + _).init
        def dBlock(i: Int) = shiftrightunsigned(col("sig"), dOffs(i))
          .bitwiseAND(lit((1L << Seq(7, 7, 7, 7, 6, 6, 6, 6, 6, 6)(i)) - 1))
        val dPairs = for { i <- 0 until 10; j <- (i + 1) until 10 } yield (i, j)
        val dKeys = array(dPairs.zipWithIndex.map { case ((i, j), pid) =>
          lit(pid.toLong * (1L << 14)) + dBlock(i) * lit(1L << 7) + dBlock(j) }: _*)
        val dColl = dsig.select(explode(dKeys).as("bk")).groupBy(col("bk")).count()
          .agg(sum((col("count") * (col("count") - 1) / lit(2)).cast("long")))
          .collect()(0).getLong(0)
        println(s"[probe] collisions over DISTINCT sigs (10b/pairs) = $dColl")
        println(s"[probe] output pairs = ${Dedup.simhash(spark, sfDir).count()}")
      case "ivfpq" =>
        Similarity.invalidateMemos(spark)
        Similarity.invalidateBaseMemos(spark)
        val t0 = System.nanoTime()
        Similarity.ivfPqTopk(spark, sfDir).count()
        println(f"[probe] ivfpq cold (incl base)       ${(System.nanoTime() - t0) / 1e9}%8.3f s")
        (1 to 3).foreach { i =>
          Similarity.invalidateMemos(spark)
          val t = System.nanoTime()
          Similarity.ivfPqTopk(spark, sfDir).count()
          println(f"[probe] ivfpq build+query rep$i       ${(System.nanoTime() - t) / 1e9}%8.3f s")
        }
    }
    spark.stop()
  }
}
