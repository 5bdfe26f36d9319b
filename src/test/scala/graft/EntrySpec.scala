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
    val expected = Set(
      "vec_ann_opq", "vec_ann_bq",
      "vec_ann_bq_index",
      "vec_procrustes",
      "mm_image_dups", "mm_audio_dups", "mm_video_dups")
    assert(rowsOnly === expected,
      s"rows-only set drifted; update COVERAGE.md: $rowsOnly")
    // no orphan oracles either
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }
}
