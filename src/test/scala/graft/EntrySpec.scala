package graft

/** Driver-contract smoke parity: every SparkEntry entry must run and
  * return rows at sf0.001 (the driver's t1 smoke), every oracle key
  * must name a real query, and entry() is non-empty. */
class EntrySpec extends SparkSpec {

  test("oracleSql keys ⊆ queries keys; no orphaned oracles") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("inventory size matches SURVEY §2 (163 queries + 19 streaming components)") {
    assert(SparkEntry.queries.size == 163, SparkEntry.queries.keys.mkString(","))
    // EVERY query is SQL-oracled (as of round 4 — even s_ann_ivf's
    // k-means trains bit-identically in the oracle); an oracle
    // silently dropped fails the build here
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"rows-only drifted: $rowsOnly")
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query returns rows at sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
