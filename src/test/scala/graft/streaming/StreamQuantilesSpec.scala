package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#197: streaming bucketed quantiles — exact to the bucket width
  * across batches, deterministic integer reads, state bounded by the
  * value domain. */
class StreamQuantilesSpec extends SparkSuite {
  import spark.implicits._

  private def run(bucketC: Long)(
      body: (MemoryStream[MeasureEvent], () => Seq[QuantileRow]) => Unit): Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[MeasureEvent](81, spark, None)
      val name = "streamquant" + math.abs(in.hashCode())
      val q = StreamQuantiles.quantiles(in.toDS(), bucketC)
        .writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-squant").toString)
        .start()
      def emitted(): Seq[QuantileRow] = {
        q.processAllAvailable()
        spark.table(name).as[QuantileRow].collect().toSeq
      }
      body(in, emitted _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  /** Nearest-rank truth at bucket granularity, computed sequentially. */
  private def truth(vals: Seq[Long], bucketC: Long, qPm: Long): Long = {
    val sorted = vals.map(v => Math.floorDiv(v, bucketC) * bucketC).sorted
    sorted(((qPm * vals.size + 999) / 1000 - 1).toInt.max(0))
  }

  test("quantiles track the full history across batches, exact at bucket width 1") {
    run(1L) { (in, emitted) =>
      val b1 = (1L to 100L).map(v => MeasureEvent("g", v * 7 % 101))
      in.addData(b1: _*)
      val e1 = emitted().last
      val v1 = b1.map(_.value_c)
      assert((e1.n, e1.p50_c, e1.p90_c, e1.p99_c) ===
        (100L, truth(v1, 1, 500), truth(v1, 1, 900), truth(v1, 1, 990)))

      // batch 2 shifts the distribution upward; quantiles cover BOTH
      val b2 = (1L to 100L).map(v => MeasureEvent("g", 200L + v))
      in.addData(b2: _*)
      val all = v1 ++ b2.map(_.value_c)
      val e2 = emitted().last
      assert((e2.n, e2.p50_c, e2.p90_c, e2.p99_c) ===
        (200L, truth(all, 1, 500), truth(all, 1, 900), truth(all, 1, 990)))
    }
  }

  test("property: random values, random batch splits == sequential truth (seeded)") {
    val rnd = new scala.util.Random(0xFACE)
    // heavy ties (small domain) + outliers, split into 4 random batches
    val vals = (1 to 400).map(_ =>
      if (rnd.nextInt(20) == 0) 100000L + rnd.nextInt(1000)
      else rnd.nextInt(500).toLong)
    val cuts = Seq(0, 1 + rnd.nextInt(130), 150 + rnd.nextInt(130),
      300 + rnd.nextInt(90), 400).distinct.sorted
    run(10L) { (in, emitted) =>
      cuts.sliding(2).foreach { case Seq(a, b) =>
        in.addData(vals.slice(a, b).map(MeasureEvent("p", _)): _*)
        val e = emitted().filter(_.group == "p").last
        val seen = vals.take(b)
        assert((e.n, e.p50_c, e.p90_c, e.p99_c) ===
          (seen.size.toLong, truth(seen, 10, 500), truth(seen, 10, 900),
            truth(seen, 10, 990)),
          s"diverged after prefix $b")
      case _ => ()
      }
    }
  }

  test("bucket width rounds down consistently; groups are independent") {
    run(100L) { (in, emitted) =>
      in.addData(
        MeasureEvent("a", 149L), MeasureEvent("a", 150L),
        MeasureEvent("a", 951L),
        MeasureEvent("b", 49L))
      val byGroup = emitted().groupBy(_.group).view.mapValues(_.last).toMap
      // a: bucketed values 100,100,900 -> p50 = 100, p99 = 900
      assert(byGroup("a").p50_c === 100L && byGroup("a").p99_c === 900L)
      assert(byGroup("b") === QuantileRow("b", 1L, 0L, 0L, 0L))
      // untouched groups emit nothing on a later batch
      in.addData(MeasureEvent("a", 500L))
      val after = emitted()
      assert(after.count(_.group == "b") === 1, "group b re-emitted unprompted")
    }
  }
}
