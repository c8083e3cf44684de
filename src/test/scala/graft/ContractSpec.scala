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
}
