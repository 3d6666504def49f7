package graft

/** Driver-contract smoke: entry() on sf0.001 returns rows; every declared
  * query key has either an oracle or a documented rows-only status; every
  * oracle key is backed by a query.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    // every query is oracle-checked (hash-level ops run portable variants)
    assert(qs.diff(os).isEmpty, s"queries without oracle: ${qs.diff(os)}")
  }

  test("every query runs on sf0.001 and yields a schema") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").schema; None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(80)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
