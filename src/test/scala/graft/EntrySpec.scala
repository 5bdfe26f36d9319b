package graft

/** Mirrors the driver's t1 smoke gate: the flagship entry must return
  * rows on sf0.001.
  */
class EntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("every query has either an oracle or documented rows-only status") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // the eigensolve family only — the declared permanent rows-only
    // set (ARCHITECTURE.md round-8: fixed-sweep Jacobi is sequential
    // in thousands of dependent rotations with no cross-engine trig
    // parity; certification = orthogonality/isometry/recovery specs)
    val expected = Set(
      "vec_ann_opq", "vec_ann_bq",
      "vec_ann_bq_index",
      "vec_procrustes")
    assert(rowsOnly === expected,
      s"rows-only set drifted; update COVERAGE.md: $rowsOnly")
    // no orphan oracles either
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
