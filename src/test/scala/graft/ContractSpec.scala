package graft

/** Driver-contract invariants: every query runs at sf0.001 and every oracle
  * key has a query (the driver joins the two maps by key). */
class ContractSpec extends SparkSpec {

  test("oracleSql keys ⊆ queries keys; oracle-less queries are the known sketch ops") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // Driver contract: omitting the oracle is allowed only for ops a SQL
    // engine can't reproduce (→ weaker rows-only check). Keep this list
    // deliberate: HLL sketches differ per engine.
    val rowsOnly = Set("q_approx_distinct")
    assert(SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet == rowsOnly)
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
