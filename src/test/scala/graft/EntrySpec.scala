package graft

/** Driver-contract smoke: `SparkEntry.entry` must return rows at sf0.001
  * (the round driver's first gate), and every declared query must have
  * either a DuckDB oracle or an intentional omission.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a declared query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet.diff(qs)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle coverage is total (no silent rows-only fallbacks)") {
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle (driver downgrades to rows-only): $missing")
  }

  test("declared-to-swept is 1:1 — a duplicate name cannot silently " +
      "shadow a verified query (the r9 text_pii_scrub bug)") {
    // AllQueries.all itself requires distinct names; this pins both that
    // guard and the declared == swept count equality it protects.
    val all = graft.queries.AllQueries.all
    assert(all.map(_.name).distinct.size == all.size)
    assert(all.size == SparkEntry.queries.size,
      s"declared ${all.size} != swept ${SparkEntry.queries.size}")
  }
}
