package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("every dirty record gets exactly one match and accuracy holds the floor") {
    val cust = graft.Tables.customer(spark, sfDir)
    val n = cust.count()
    val out = EntityResolution.erMatches(spark, sfDir).cache()
    assert(out.count() === n, "one match row per dirty record")
    assert(out.select(countDistinct(col("dirty_id"))).as[Long].head === n)
    val acc = out.agg(avg(col("correct"))).as[Double].head
    assert(acc >= 0.95, s"match accuracy $acc below floor")
    // the true match is one edit away, so a correct winner has lev 1
    // (lev 0 is impossible: every dirty name lost a character)
    assert(out.filter(col("correct") === 1 && col("lev") =!= 1).count() === 0)
    out.unpersist()
  }

  test("segment-corrupted records are invisible to pass A but still matched (pass B is load-bearing)") {
    val cust = graft.Tables.customer(spark, sfDir)
    val dirty = EntityResolution.dirtyRecords(cust)
    // the corruption itself: every 7th record's segment matches NO clean segment
    val segs = cust.select(col("c_mktsegment")).distinct().as[String].collect().toSet
    assert(!segs.contains("UNKNOWN"))
    assert(dirty.filter(col("d_id") % 7 === 0 && col("d_seg") =!= "UNKNOWN").count() === 0)
    // and yet the corrupted population still resolves correctly
    val out = EntityResolution.erMatches(spark, sfDir)
      .filter(col("dirty_id") % 7 === 0)
    val accCorrupted = out.agg(avg(col("correct"))).as[Double].head
    assert(accCorrupted >= 0.95,
      s"corrupted-segment accuracy $accCorrupted — second blocking pass not recovering them")
  }
}
