package graft

/** Every declared query runs at sf0.001 and (where the operator's output
  * is inherently non-empty) returns rows; oracle equivalence itself is
  * checked by the driver / tools/check.py. */
class QueryBatterySpec extends SparkSuite {

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.allQueries.flatMap { q =>
      try { q.fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(q.name -> e.getMessage.take(120)) }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("queries iterate in declaration order (stable bench slots)") {
    // hash-map iteration order changes with SIZE, which reshuffled the
    // battery execution order every round and made per-query driver
    // timings incomparable; the ListMap pins declaration order
    assert(SparkEntry.queries.keys.toSeq == SparkEntry.allQueries.map(_.name))
  }
}
