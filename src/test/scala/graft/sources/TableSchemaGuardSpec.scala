package graft.sources

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.types._

/** The round-8 postmortem lesson GENERALIZED: the driver regenerates
  * the test parquet between rounds and has already changed a physical
  * encoding once (events.ts, which silently broke 50 queries — see
  * EventsSchemaDriftSpec). This guard pins the column types every
  * OTHER engine assumption rests on, so the next regeneration that
  * drifts a type fails HERE, in one readable assertion, instead of as
  * dozens of downstream analysis errors.
  *
  * Each assertion names the seam that would need the fix — the guard
  * is a tripwire, not a prohibition: when the driver legitimately
  * changes an encoding, extend the loader (as eventsRaw does for ts)
  * and re-pin here. */
class TableSchemaGuardSpec extends SparkSuite {

  private def fieldType(table: String, field: String): DataType =
    Tables.load(spark, sf, table).schema(field).dataType

  test("events: the loader normalizes ts to TimestampType whatever the file holds") {
    assert(fieldType("events", "ts") === TimestampType,
      "events.ts did not normalize — extend Tables.normalizeTs for the new encoding")
    assert(fieldType("events", "event_id") === LongType)
    assert(fieldType("events", "user_id") === LongType,
      "user_id feeds bitmap_bit_position and pmod sharding — must stay integral")
    assert(fieldType("events", "value") === DoubleType,
      "value feeds cents() per-row rounding — a decimal/float32 switch changes hashes")
    assert(fieldType("events", "event_type") === StringType)
    assert(fieldType("events", "props") === StringType,
      "props feeds get_json_object / variant parsing")
  }

  test("documents: text pipeline column contract") {
    assert(fieldType("documents", "doc_id") === LongType,
      "doc_id is the dedup/cluster join key — an int32 switch changes hash buckets")
    assert(fieldType("documents", "text") === StringType)
    assert(fieldType("documents", "lang") === StringType)
    assert(fieldType("documents", "source") === StringType,
      "source scopes the shingle candidate join and sampling strata")
    assert(fieldType("documents", "n_chars") === LongType)
  }

  test("embeddings: vector contract (array<float> cast to double once at load)") {
    assert(fieldType("embeddings", "vec_id") === LongType)
    assert(fieldType("embeddings", "embedding") === ArrayType(FloatType),
      "a float64 regeneration changes every cosine µ-value — re-pin the " +
        "corpus() cast and the DuckDB oracle's list_transform together")
    assert(fieldType("embeddings", "label") === IntegerType)
    // dimension is part of the contract: LSH bit sampling and PQ
    // subvector splits assume it
    val dim = Tables.embeddings(spark, sf)
      .selectExpr("size(embedding) AS d").distinct().collect()
    assert(dim.map(_.getInt(0)).toSeq === Seq(64),
      "embedding dimension drifted — hyperplane seeds and PQ m-splits assume 64")
  }

  test("TPC-H star schema: the money/date/key columns the oracles mirror") {
    assert(fieldType("lineitem", "l_extendedprice") === DoubleType,
      "cents() per-row rounding mirrors DuckDB on DOUBLE — decimal drift " +
        "changes rounding seams")
    assert(fieldType("lineitem", "l_quantity") === DoubleType)
    assert(fieldType("lineitem", "l_orderkey") === LongType)
    assert(fieldType("orders", "o_custkey") === LongType)
    assert(fieldType("customer", "c_custkey") === LongType)
    assert(fieldType("customer", "c_acctbal") === DoubleType)
    // o_orderdate: any timestamp flavor the router's cast normalizes
    val od = fieldType("orders", "o_orderdate")
    assert(od === TimestampNTZType || od === TimestampType || od === DateType,
      s"o_orderdate read as $od — cdc_table_router's cast assumes a " +
        "timestamp/date flavor; extend it like eventsRaw if this drifts")
  }
}
