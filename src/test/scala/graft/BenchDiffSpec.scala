package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench round-over-round regression diff (VERDICT r9 item 7):
  * parse our own bench JSON line, compare runs, flag only real
  * slowdowns. */
class BenchDiffSpec extends AnyFunSuite {

  private val line =
    """{"metric":"total","value":9.5,"unit":"sec","queries":{"q1_agg":0.41,""" +
      """"ann_ivf_pq":5.04,"dedup_cluster":-1.0,"ts_ewma":1.2e-1},""" +
      """"errors":{},"n_errors":0,"gc_ms":12,"sf":"/root/testdata/sf0.1"}"""

  test("parseQueries reads the queries object, including sentinels and exponents") {
    val q = Bench.parseQueries(line)
    assert(q === Map("q1_agg" -> 0.41, "ann_ivf_pq" -> 5.04,
      "dedup_cluster" -> -1.0, "ts_ewma" -> 0.12))
    assert(Bench.parseQueries("""{"metric":"total"}""") === Map.empty)
  }

  test("regressions: ratio > 2x AND > 0.5s absolute; sentinels and new queries excluded") {
    val prev = Map("a" -> 1.0, "b" -> 0.1, "c" -> 2.0, "d" -> -1.0, "e" -> 1.0)
    val cur = Map(
      "a" -> 2.6,  // 2.6x and +1.6s -> flagged
      "b" -> 0.4,  // 4x but only +0.3s -> noise, not flagged
      "c" -> 3.5,  // 1.75x -> not flagged
      "d" -> 5.0,  // prev was a failure sentinel -> not comparable
      "e" -> -1.0, // current failure -> bench already fails the run
      "f" -> 9.0)  // new query, no baseline
    assert(Bench.regressions(prev, cur) === Map("a" -> (1.0, 2.6)))
  }
}
