package graft.cdc

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.Pipeline
import graft.sources.ChangefeedLog
import graft.functions.Fns.{normText, shingleHashes, tokens}
import org.apache.spark.sql.functions._

/** §2#302 — the FULL-PIPELINE demo §4 promises (r16 verdict #6c), in
  * ONE process over the DSv2 log:
  *
  *   relay  — GraftMain (`--once`, `--queue changefeed:<out>`) drains a
  *            DOCUMENT changefeed from the upstream segment log through
  *            the DSv2 sink, committing the publish cursor;
  *   ingest — the downstream job batch-reads the RELAYED log with the
  *            same `graft-changefeed` source, compacts latest-per-key
  *            (the update's second version wins), and parses payloads
  *            back into a typed documents frame;
  *   export — that frame runs the train-data stage chain
  *            ([[Pipeline.streamIngest]]: normalize → exact dedup →
  *            quality gate → decontaminate → stratified sample) — the
  *            same transform the streaming ingest uses, here as the
  *            batch backfill.
  *
  * The pinned property: the export over the relayed+compacted feed
  * EQUALS the export over the source-of-truth end state — relaying
  * through the log/queue machinery loses nothing and resurrects
  * nothing. Plus the per-stage fates: the update's latest text is the
  * one exported, exactly one of an exact-dup pair survives, the
  * contaminated / short / sampled-out docs are absent, and the cursor
  * and metrics agree with the feed.
  */
class TrainExportE2eSpec extends SparkSuite {
  import spark.implicits._

  // stratified buckets (Sampling.stratifiedRatesPm: en 100‰, de 400‰):
  // bucket(0)=0, bucket(23)=76, bucket(27)=50, bucket(31)=17 → en keeps;
  // bucket(7)=201, bucket(11)=168 → de keeps; bucket(4)=974 → dropped
  private val textA1 =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val textA2 = textA1 + " nu xi omicron"
  private val textB =
    "one two three four five six seven eight nine ten eleven twelve thirteen"
  private val textC = "contamination starts here quick brown fox jumps " +
    "over and then continues with more words"
  private val textD = "der schnelle braune fuchs springt ueber den " +
    "faulen hund heute nacht wirklich"
  private val textE = "completely unrelated text about nothing in " +
    "particular but long enough to pass the gate"
  private val textShort = "kurz text nur fuenf"
  private val evalText = "the quick brown fox jumps over the lazy dog tonight"

  private def payload(id: Long, text: String, lang: String): String =
    s"""{"after": {"doc_id": $id, "text": "$text", "lang": "$lang", "source": "web"}}"""

  test("relay -> ingest -> train-data export in one process over the DSv2 log") {
    // ---- upstream: a document changefeed in the segment log --------
    val in = Files.createTempDirectory("e2e-in-log").toString
    def rec(us: Long, id: Long, text: String, lang: String) =
      ChangefeedLog.Record(us, Some("documents"), Some(s"[$id]"),
        payload(id, text, lang))
    ChangefeedLog.writeSegment(in, Seq(
      rec(10, 0L, textA1, "en"),
      rec(20, 23L, textB, "en"),
      rec(30, 27L, textB, "en"),          // exact duplicate of doc 23
      rec(40, 31L, textC, "en"),          // contaminated vs the eval set
      rec(50, 7L, textD, "de"),
      rec(60, 4L, textE, "en"),           // sampled out (bucket 974)
      rec(70, 11L, textShort, "de"),      // quality-gated (4 tokens)
      rec(80, 0L, textA2, "en"),          // the UPDATE: latest wins
      ChangefeedLog.Record(90, None, None, "{\"resolved\": \"90.0000000000\"}")))

    // ---- relay: the reference's application shell, once-mode -------
    val out = Files.createTempDirectory("e2e-out-log").toString
    val cursorKey = "e2e-train-export"
    val metricsText = GraftMain.run(spark, GraftConfig.fromArgs(Seq(
      "--table", "documents",
      "--log-dir", in,
      "--queue", s"changefeed:$out",
      "--cursor-store", s"inmemory:$cursorKey",
      "--checkpoint-dir", Files.createTempDirectory("e2e-ckpt").toString,
      "--metrics-port", "0",
      "--once", "true")))
    assert(metricsText.contains("messages_sent 8"))
    assert(new InMemoryCursorStore(cursorKey).get() === Some("90"))

    // ---- ingest: batch-read the relayed log, compact, re-type ------
    val relayed = spark.read.format("graft-changefeed")
      .option("path", out).load()
      .where(col("tbl") === "documents")
    assert(relayed.count() === 8L)
    val docsFrame = relayed
      .groupBy(col("key"))
      .agg(max_by(col("value"), col("sort_us")).as("value"))
      .select(
        get_json_object(col("value"), "$.after.doc_id").cast("long").as("doc_id"),
        get_json_object(col("value"), "$.after.text").as("text"),
        get_json_object(col("value"), "$.after.lang").as("lang"),
        get_json_object(col("value"), "$.after.source").as("source"))
    assert(docsFrame.count() === 7L) // 8 changes over 7 distinct keys

    // ---- export: the train-data stage chain over the ingested frame
    val evalHashes = spark.range(1)
      .select(explode(shingleHashes(tokens(normText(lit(evalText))), 4)).as("h"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val export = Pipeline.streamIngest(docsFrame, evalHashes).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

    // the pinned property: identical to exporting the source-of-truth
    // end state directly — the relay/compaction leg is lossless.
    // Compared content-wise ((lang, source, n_tokens) multisets): the
    // exact-dup pair is identical text, so EITHER id may be the kept
    // one per run of dropDuplicates
    val endState = Seq(
      (0L, textA2, "en", "web"), (23L, textB, "en", "web"),
      (27L, textB, "en", "web"), (31L, textC, "en", "web"),
      (7L, textD, "de", "web"), (4L, textE, "en", "web"),
      (11L, textShort, "de", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val truth = Pipeline.streamIngest(endState, evalHashes).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(export.map(t => (t._3, t._2, t._4)).sorted.toSeq ===
      truth.map(t => (t._3, t._2, t._4)).sorted.toSeq,
      s"relayed export ${export.toSeq} != end-state export ${truth.toSeq}")

    // per-stage fates
    val byId = export.map(t => t._1 -> t).toMap
    assert(byId.contains(0L) && byId(0L)._4 === 15L,
      s"update's latest version (15 tokens) not the exported one: $byId")
    assert(byId.contains(7L), "surviving de doc missing")
    assert(!byId.contains(31L), "contaminated doc exported")
    assert(!byId.contains(4L), "sampled-out doc exported")
    assert(!byId.contains(11L), "quality-gated doc exported")
    assert(Seq(23L, 27L).count(byId.contains) === 1,
      s"exact-dup pair: expected exactly one survivor in ${byId.keySet}")
    // doc 0 (updated), one of the dup pair, doc 7 — and nothing else
    assert(export.length === 3)
  }
}
