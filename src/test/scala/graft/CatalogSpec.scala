package graft

/** Every catalog query runs end-to-end on sf0.001 and agrees with its oracle
  * on column names (the driver's hash-compare sorts columns by name, so a
  * drifted alias fails t2 even when values match). Value-level parity is the
  * DuckDB compare (tools/compare.py); this spec is the fast regression net. */
class CatalogSpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query impl") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without impl: ${o.diff(q)}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes on sf0.001 with deterministic output") {
      val df = fn(spark, sf001)
      val rows1 = df.collect()
      assert(df.columns.distinct.length == df.columns.length,
        "duplicate output column names break the oracle compare")
      // re-run: same rows in the same order (total ORDER BY discipline)
      val rows2 = fn(spark, sf001).collect()
      assert(rows1.sameElements(rows2), "nondeterministic output order")
    }
  }
}
