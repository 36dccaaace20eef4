package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mechanical sync between SURVEY.md §2 (the judge's coverage
  * checklist) and the code's actual query surface. Checklist drift is
  * how operators escape gates — r5 shipped four queries the §8b prose
  * still counted as 95 — so the invariant is enforced by a spec, not
  * by discipline:
  *
  *   - every §2 row marked `sql`  ⇒ a `queries` entry AND an
  *     `oracleSql` entry (the DuckDB hash gate applies);
  *   - every §2 row marked `rows` ⇒ a `queries` entry and NO
  *     `oracleSql` entry (rows-only by design);
  *   - `queries.keySet` ⊆ §2 — nothing ships without a checklist row;
  *   - §2 component ids are unique (no double-numbered rows).
  */
class SurveyInvariantSpec extends AnyFunSuite {

  private case class Row(id: String, name: Option[String], check: String)

  private lazy val surveyText: String = {
    val f = new java.io.File("SURVEY.md")
    assert(f.exists(), s"SURVEY.md not found at ${f.getAbsolutePath}")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.mkString finally src.close()
  }

  private lazy val surveyRows: Seq[Row] = {
    val lines = surveyText.linesIterator.toVector
    val backtick = "`([A-Za-z0-9_.]+)`".r
    // | id | name | what | check | — description cells legitimately
    // contain literal `|` (|A∩B|, |events|²), so anchor on the first
    // and last cells and take the first backticked token after the id
    // (the name cell precedes the description).
    val row = "^\\|\\s*([^|]*?)\\s*\\|(.*)\\|\\s*(sql|rows|test)\\s*\\|\\s*$".r
    lines.flatMap {
      case row(id, middle, check) =>
        Some(Row(id, backtick.findFirstMatchIn(middle).map(_.group(1)), check))
      case _ => None
    }
  }

  test("SURVEY §2 totals: 81 sql + 18 rows + 19 test") {
    val byCheck = surveyRows.groupBy(_.check).view.mapValues(_.size).toMap
    assert(byCheck.getOrElse("sql", 0) === SparkEntry.oracleSql.size,
      s"sql rows (${byCheck.getOrElse("sql", 0)}) != oracleSql entries (${SparkEntry.oracleSql.size})")
    assert(byCheck.getOrElse("sql", 0) + byCheck.getOrElse("rows", 0)
      === SparkEntry.queries.size,
      "sql+rows rows != queries entries")
  }

  test("every sql row has a queries entry and an oracleSql entry") {
    val sqlRows = surveyRows.filter(_.check == "sql")
    val missingName = sqlRows.filter(_.name.isEmpty)
    assert(missingName.isEmpty,
      s"sql rows without a backticked name: ${missingName.map(_.id)}")
    val names = sqlRows.flatMap(_.name)
    val noQuery = names.filterNot(SparkEntry.queries.contains)
    val noOracle = names.filterNot(SparkEntry.oracleSql.contains)
    assert(noQuery.isEmpty, s"sql rows missing from queries: $noQuery")
    assert(noOracle.isEmpty, s"sql rows missing from oracleSql: $noOracle")
  }

  test("every rows row has a queries entry and NO oracleSql entry") {
    val names = surveyRows.filter(_.check == "rows").flatMap(_.name)
    val noQuery = names.filterNot(SparkEntry.queries.contains)
    val hasOracle = names.filter(SparkEntry.oracleSql.contains)
    assert(noQuery.isEmpty, s"rows rows missing from queries: $noQuery")
    assert(hasOracle.isEmpty,
      s"rows rows unexpectedly oracle-checked (promote to sql in SURVEY): $hasOracle")
  }

  test("queries.keySet has no entry missing from SURVEY §2") {
    val surveyNames = surveyRows.filterNot(_.check == "test").flatMap(_.name).toSet
    val unlisted = SparkEntry.queries.keySet.diff(surveyNames)
    assert(unlisted.isEmpty, s"queries with no SURVEY §2 row: $unlisted")
  }

  test("oracleSql keys are all queries keys") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracleSql entries with no query: $orphans")
  }

  test("rowsChecks cover exactly the rows-kind queries") {
    // the structural gates exist to close the rows-kind trust gap —
    // every rows-kind query must carry one, and none may shadow a
    // hash-gated sql query (the stronger gate already applies there)
    val rowsNames = surveyRows.filter(_.check == "rows").flatMap(_.name).toSet
    val unchecked = rowsNames.diff(SparkEntry.rowsChecks.keySet)
    val misplaced = SparkEntry.rowsChecks.keySet.diff(rowsNames)
    assert(unchecked.isEmpty, s"rows-kind queries with no shape check: $unchecked")
    assert(misplaced.isEmpty, s"rowsChecks on non-rows queries: $misplaced")
  }

  /** r14 judge: README.md said "227 queries" one landing after the
    * count became 228 — the README is the first thing a new session
    * reads, so its count is pinned to the mechanical one here. */
  test("README query count matches SparkEntry.queries.size") {
    val f = new java.io.File("README.md")
    assert(f.exists(), s"README.md not found at ${f.getAbsolutePath}")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    val readme = try src.mkString finally src.close()
    val claim = raw"driver contract: (\d+) queries".r.findFirstMatchIn(readme)
    assert(claim.isDefined, "README no longer states the query count " +
      "('driver contract: N queries' line missing)")
    assert(claim.get.group(1).toInt === SparkEntry.queries.size,
      s"README claims ${claim.get.group(1)} queries, " +
        s"SparkEntry has ${SparkEntry.queries.size}")
  }

  test("§2 component ids are unique") {
    val ids = surveyRows.map(_.id).filter(_.forall(_.isDigit))
    val dups = ids.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty, s"duplicate SURVEY §2 ids: $dups")
  }

  /** §8's prose quotes totals per round; older rounds legitimately
    * quote OLDER numbers, so only the LAST occurrence of each claim —
    * the one describing the current tree — is pinned to the mechanical
    * counts. (r5 drifted 95→99, r6 drifted 141→138 and 192→183: prose
    * totals the spec didn't cover drifted within one round each time.) */
  test("§8 prose totals: the latest claims match the mechanical counts") {
    def lastMatch(re: scala.util.matching.Regex): Option[scala.util.matching.Regex.Match] =
      re.findAllMatchIn(surveyText).toSeq.lastOption

    for (m <- lastMatch(raw"(\d+) SURVEY components".r))
      assert(m.group(1).toInt === surveyRows.size,
        s"latest '.. SURVEY components' prose claims ${m.group(1)}, " +
          s"but §2 has ${surveyRows.size} rows")

    for (m <- lastMatch(raw"(\d+) queries = (\d+) sql \+ (\d+) rows".r)) {
      val byCheck = surveyRows.groupBy(_.check).view.mapValues(_.size).toMap
      assert(m.group(1).toInt === SparkEntry.queries.size,
        s"latest query-count prose claims ${m.group(1)}, " +
          s"but queries has ${SparkEntry.queries.size} entries")
      assert(m.group(2).toInt === byCheck.getOrElse("sql", 0) &&
        m.group(3).toInt === byCheck.getOrElse("rows", 0),
        s"latest sql/rows split prose (${m.group(2)}+${m.group(3)}) != " +
          s"§2 (${byCheck.getOrElse("sql", 0)}+${byCheck.getOrElse("rows", 0)})")
    }

    // spec totals can't be counted from inside a running spec — the
    // policy is to stop hand-writing them; pin that the CURRENT round's
    // prose never reintroduces one after this line
    val specClaim = raw"(\d+) ScalaTest specs green".r
    val afterR7 = surveyText.indexOf("SurveyInvariantSpec pins the component")
    if (afterR7 >= 0)
      assert(specClaim.findFirstMatchIn(surveyText.substring(afterR7)).isEmpty,
        "hand-written 'N ScalaTest specs green' reintroduced after the " +
          "r7 policy line — quote the suite as green without a count")
  }
}
