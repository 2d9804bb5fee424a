package graft

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySmokeSpec extends SparkTestBase {
  test("SparkEntry.entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
