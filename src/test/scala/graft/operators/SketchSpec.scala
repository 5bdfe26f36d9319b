package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate/sketch aggregates: results are engine-specific (no
  * DuckDB hash oracle possible), so correctness is asserted as error
  * bounds against the exact computation — the guarantee a user
  * actually relies on.
  */
class SketchSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) within 5% of exact on order keys") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_orderkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    info(f"exact=$exact approx=$approx err=${err * 100}%.2f%%")
    assert(err < 0.05)
  }

  test("approx_percentile brackets the exact percentile within rank tolerance") {
    val ord = graft.Tables.orders(spark, sfDir)
    val Seq(exact50, exact90) = ord
      .select(expr("percentile(o_totalprice, array(0.5, 0.9))")).collect()
      .head.getSeq[Double](0).toSeq
    val Seq(approx50, approx90) = ord
      .select(expr("approx_percentile(o_totalprice, array(0.5, 0.9), 1000)")).collect()
      .head.getSeq[Double](0).toSeq
    // 1/accuracy = 0.1% rank error; translate to a generous value check
    // by verifying the approximate answers fall between nearby exact ranks
    val Seq(lo45, hi55) = ord
      .select(expr("percentile(o_totalprice, array(0.45, 0.55))")).collect()
      .head.getSeq[Double](0).toSeq
    val Seq(lo85, hi95) = ord
      .select(expr("percentile(o_totalprice, array(0.85, 0.95))")).collect()
      .head.getSeq[Double](0).toSeq
    info(s"p50 exact=$exact50 approx=$approx50; p90 exact=$exact90 approx=$approx90")
    assert(approx50 >= lo45 && approx50 <= hi55)
    assert(approx90 >= lo85 && approx90 <= hi95)
  }

  test("HLL sketch merges across groups like the global sketch") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val global = li.select(approx_count_distinct(col("l_orderkey"), 0.02))
      .collect().head.getLong(0)
    val summed = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey"), 0.02).as("d"))
      .agg(sum(col("d"))).collect().head.getLong(0)
    // groups overlap in orderkeys, so the per-group sum must be ≥ global
    assert(summed >= global)
  }
}
