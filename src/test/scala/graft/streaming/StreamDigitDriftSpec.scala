package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#280: streaming Benford drift — digit fold, deviation argmax,
  * cross-batch accumulation, non-positive skip. */
class StreamDigitDriftSpec extends SparkSuite {
  import spark.implicits._

  private def run(body: (MemoryStream[DigitEvent], () => Seq[DigitDrift]) => Unit)
      : Unit = {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[DigitEvent](98, spark, None)
      val q = StreamDigitDrift.drift(in.toDS())
        .writeStream.outputMode("update")
        .format("memory").queryName("digitdrift")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-digitdrift").toString)
        .start()
      def all(): Seq[DigitDrift] = {
        q.processAllAvailable()
        spark.table("digitdrift").as[DigitDrift].collect().toSeq
      }
      body(in, all _)
      q.stop()
    } finally spark.conf.unset(key)
  }

  private def latest(rows: Seq[DigitDrift]): Map[String, DigitDrift] =
    rows.groupBy(_.key).view.mapValues(_.maxBy(_.n_total)).toMap

  test("all-ones flow: digit 1 at 1000 permille, worst dev on digit 1") {
    run { (in, all) =>
      // leading digits: 1, 1, 1 (100, 1999, 12) → obs(1) = 1000‰,
      // dev(1) = |1000 − 301| = 699; every other digit devs at its
      // expectation (max 301 for… digit 1 again) → worst = digit 1
      in.addData(DigitEvent("k", 1, 100L), DigitEvent("k", 2, 1999L),
        DigitEvent("k", 3, 12L))
      val v = latest(all())("k")
      assert(v.n_total === 3L)
      assert(v.worst_digit === 1L && v.worst_dev_pm === 699L)
    }
  }

  test("benford-ish flow scores lower than uniform flow") {
    run { (in, all) =>
      // b: 30 obs ≈ Benford proportions (9/5/4/3/2/2/2/2/1 per digit)
      val benford = Seq(9, 5, 4, 3, 2, 2, 2, 2, 1).zipWithIndex.flatMap {
        case (n, d) => Seq.fill(n)((d + 1).toLong)
      }
      in.addData(benford.zipWithIndex.map { case (d, i) =>
        DigitEvent("b", i.toLong, d * 100L)
      }: _*)
      // u: 9 obs, one per digit (uniform)
      in.addData((1L to 9L).map(d => DigitEvent("u", d, d * 10L)): _*)
      val m = latest(all())
      assert(m("b").worst_dev_pm < m("u").worst_dev_pm)
    }
  }

  test("counts accumulate across batches; non-positive rows skipped") {
    run { (in, all) =>
      in.addData(DigitEvent("k", 1, 500L), DigitEvent("k", 2, 0L),
        DigitEvent("k", 3, -30L))
      val first = latest(all())("k")
      assert(first.n_total === 1L) // only the 500 counted
      in.addData(DigitEvent("k", 4, 900L))
      val second = latest(all())("k")
      // digits 5 and 9: obs 500‰ each; dev(5) = |500−79| = 421,
      // dev(9) = |500−46| = 454, dev(1) = 301 → worst digit 9
      assert(second.n_total === 2L)
      assert(second.worst_digit === 9L && second.worst_dev_pm === 454L)
    }
  }
}
