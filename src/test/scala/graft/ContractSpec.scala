package graft

/** Driver-contract invariants: every query runs at sf0.001 and every oracle
  * key has a query (the driver joins the two maps by key). */
class ContractSpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    // Full-strength contract: since r2 even the HLL sketch query has a
    // hash-matchable oracle (exact count + within-tolerance boolean), so
    // NO query is allowed to fall back to the weaker rows-only check.
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }

  test("every query executes and returns a schema at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
      assert(df.count() >= 0, s"$name: failed to execute")
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("COVERAGE.md header count matches SparkEntry.queries.size") {
    // The header's "N/N hash-match" claim drifted twice when queries were
    // added without a doc update (121→126 in r6, 126→131 in r8) — derive
    // the check instead of hand-auditing it each round.
    // Resolve robustly: CWD first, then user.dir (sbt fork working dirs
    // can differ from the repo root).
    val candidates = Seq(
      java.nio.file.Paths.get("COVERAGE.md"),
      java.nio.file.Paths.get(sys.props("user.dir"), "COVERAGE.md"))
    val covPath = candidates.find(java.nio.file.Files.exists(_)).getOrElse(
      fail("COVERAGE.md not found in CWD or user.dir — run tests from the repo root"))
    val text = new String(java.nio.file.Files.readAllBytes(covPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val m = """(\d+)/(\d+) hash-match""".r.findFirstMatchIn(text)
    assert(m.isDefined, "COVERAGE.md must state an 'N/N hash-match' count")
    val n = SparkEntry.queries.size
    assert(m.get.group(1).toInt == n && m.get.group(2).toInt == n,
      s"COVERAGE.md says ${m.get.group(1)}/${m.get.group(2)} but " +
        s"SparkEntry.queries has $n entries — update the header")
  }
}
