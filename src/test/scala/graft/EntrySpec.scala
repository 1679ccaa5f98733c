package graft

/** Driver-contract guards: entry() is non-empty on sf0.001, and every
  * query has an oracle (the driver records a weaker rows-only check for
  * oracle-less queries — we require full coverage).
  */
class EntrySpec extends SparkSuite {

  test("queries and oracleSql keys are in sync") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("entry() returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty on sf0.001 except known-empty dedup") {
    val mayBeEmpty = Set("q20_dedup_exact")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      assert(mayBeEmpty(name) || n > 0, s"$name returned 0 rows")
    }
  }
}
