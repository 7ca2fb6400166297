package graft

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
  test("every declared oracle has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
