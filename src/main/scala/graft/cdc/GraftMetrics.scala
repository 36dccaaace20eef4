package graft.cdc

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.util.LongAccumulator

/** The reference's Prometheus surface (src/metrics.rs: an IntCounter
  * `rabbitmq_messages_sent` served as text at `/metrics`) re-expressed
  * for Spark: counters are LongAccumulators — the cluster-correct
  * counter primitive (executor increments merge into the driver value
  * for free) — snapshot-able as a DataFrame and served in Prometheus
  * text exposition format by the JDK's built-in HTTP server (no web
  * framework dependency).
  */
class GraftMetrics(spark: SparkSession) {

  private val counters =
    new java.util.concurrent.ConcurrentHashMap[String, LongAccumulator]()

  /** Create-or-get a named counter (register_int_counter equivalent). */
  def counter(name: String): LongAccumulator =
    counters.computeIfAbsent(name, n => spark.sparkContext.longAccumulator(s"graft.$n"))

  /** Adopt an accumulator created elsewhere (e.g. a pipeline's
    * messages_sent) under a metric name. */
  def register(name: String, acc: LongAccumulator): Unit =
    counters.put(name, acc)

  import scala.jdk.CollectionConverters._
  private def sortedCounters: Seq[(String, Long)] =
    counters.asScala.toSeq.map { case (n, a) => (n, a.value.longValue) }.sortBy(_._1)

  /** Counter snapshot as a queryable DataFrame. */
  def snapshot(): DataFrame = {
    import spark.implicits._
    sortedCounters.toDF("metric", "value")
  }

  /** Prometheus text exposition format, byte-compatible with what the
    * reference's TextEncoder emits for plain counters. */
  def prometheusText(): String =
    sortedCounters.map { case (n, v) =>
      s"# TYPE $n counter\n$n $v\n"
    }.mkString

  /** Serve `/metrics` (reference src/metrics.rs:17-22). Returns the
    * bound server; `stop(0)` it when done. Port 0 picks a free port. */
  def serve(port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/metrics", exchange => {
      val body = prometheusText().getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4")
      exchange.sendResponseHeaders(200, body.length)
      val os = exchange.getResponseBody
      os.write(body); os.close()
    })
    server.start()
    server
  }
}
