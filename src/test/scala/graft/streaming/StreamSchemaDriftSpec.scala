package graft.streaming

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** §2#205: live schema-drift sentinel — first appearance of a
  * (table, payload-key) pair emits once; redeliveries and steady-state
  * columns are silent; tables are independent; resolved rows ignored. */
class StreamSchemaDriftSpec extends SparkSuite {
  import spark.implicits._

  private def row(us: Long, tbl: String, keys: Seq[String]): (Long, String, String, String) =
    (us, tbl, "[1]",
      s"""{"after": {${keys.map(k => s""""$k": 1""").mkString(", ")}}}""")

  test("first appearance emits once; later keys alert; nothing re-fires") {
    implicit val s = spark
    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, String, String, String)](61, spark, None)
      val name = "schemadrift" + math.abs(in.hashCode())
      val frame = in.toDF().toDF("sort_us", "tbl", "key", "value")
      val q = StreamSchemaDrift.events(frame)
        .writeStream.outputMode("append")
        .format("memory").queryName(name)
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt-drift").toString)
        .start()
      def emitted(): Seq[SchemaEvent] = {
        q.processAllAvailable()
        spark.table(name).as[SchemaEvent].collect().toSeq
      }

      // batch 1: events carries {id, v}; orders carries {id} — note the
      // SAME key name on another table is its own registry entry
      in.addData(row(100, "events", Seq("id", "v")),
        row(90, "events", Seq("id")), // earlier commit: min wins
        row(50, "orders", Seq("id")),
        (120L, null, null, """{"resolved": "120.0000000000"}"""))
      val e1 = emitted().toSet
      assert(e1 === Set(
        SchemaEvent("events", "id", 90L), SchemaEvent("events", "v", 100L),
        SchemaEvent("orders", "id", 50L)))

      // batch 2: pure redelivery — silent
      in.addData(row(200, "events", Seq("id", "v")))
      assert(emitted().size === 3)

      // batch 3: upstream ALTER TABLE — a new column starts flowing
      in.addData(row(300, "events", Seq("id", "v", "added_col")))
      val e3 = emitted()
      assert(e3.size === 4)
      assert(e3.contains(SchemaEvent("events", "added_col", 300L)))
    } finally spark.conf.unset(key)
  }
}
