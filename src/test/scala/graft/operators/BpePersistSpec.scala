package graft.operators

import graft.SparkSuite

/** The persisted-tokenizer artifact (persistBpe): because the trainer
  * is deterministic over strings and longs, the persisted merge table
  * and the persisted-vocab encode must equal the inline (memoized)
  * path EXACTLY — row for row, value for value. This is the fourth
  * persisted artifact (after the ANN index, the pair graph, and the
  * band table) and the only one where the pin is full equality rather
  * than floors, so the spec asserts it bit-for-bit. */
class BpePersistSpec extends SparkSuite {

  test("persisted merges + persisted-vocab encode equal the inline path exactly") {
    val name = "bpe_spec_" + math.abs(this.hashCode())
    TextAnalysis.persistBpe(spark, sf, merges = 8, name = name)

    val inlineMerges = TextAnalysis.bpeTrain(spark, sf, 8).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val persistedMerges = TextAnalysis.bpeTrainPersisted(spark, name).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(persistedMerges.toSeq === inlineMerges.toSeq,
      "persisted merge table diverged from the inline trainer")
    assert(persistedMerges.nonEmpty)

    val inlineEnc = TextAnalysis.bpeEncode(spark, sf, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val persistedEnc = TextAnalysis.bpeEncodePersisted(spark, sf, name)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(persistedEnc.toSeq === inlineEnc.toSeq,
      "persisted-vocab encode diverged from the inline encode")

    // the artifact really is bucketed on the probe key: the vocab-side
    // scan of the persisted encode must carry NO exchange (Spark reads
    // the bucketed layout directly; only the exploded corpus side may
    // shuffle). SelectedBucketsCount appearing on the vocab scan is the
    // executable proof.
    val plan = TextAnalysis.bpeEncodePersisted(spark, sf, name)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount") ||
      plan.contains("Bucketed: true"),
      s"persisted vocab not read as bucketed:\n$plan")
  }

  test("encode no longer mandates a broadcast: strategy is left to stats/AQE") {
    // the 100 TB seam the r11 verdict flagged: a vocab-sized
    // broadcast() hint would OOM at Heaps'-law vocab sizes. The plan
    // may still BE a broadcast join here (AQE's choice at test sf) —
    // what must be gone is the unconditional ResolvedHint in the
    // analyzed plan, which overrides stats at any scale.
    val analyzed = TextAnalysis.bpeEncode(spark, sf, 8)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("UnresolvedHint") &&
      !analyzed.contains("ResolvedHint"),
      s"broadcast mandate still present in analyzed plan:\n$analyzed")
  }
}
