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

  test("cms estimate is exact when the sketch is collision-free") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i % 10).toLong).toDF("k")
    val sk = df.agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("cms"))
    val out = df.groupBy($"k").count().crossJoin(broadcast(sk))
      .select($"k", $"count",
        graft.functions.CmsEstimate($"cms", $"k").as("est"))
      .collect()
    assert(out.length === 10)
    // 10 keys in a 2719-wide, depth-7 sketch: no row has all-colliding
    // cells, so every estimate equals the exact count
    out.foreach(r => assert(r.getAs[Long]("est") === r.getAs[Long]("count")))
  }

  test("cms sketches merge across partitions without changing estimates") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (i % 50).toLong).toDF("k")
    val one = df.coalesce(1)
      .agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("cms"))
    val many = df.repartition(16)
      .agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("cms"))
    val probe = (0L until 50L).toDF("k")
    def estimates(sk: org.apache.spark.sql.DataFrame) =
      probe.crossJoin(broadcast(sk))
        .select($"k", graft.functions.CmsEstimate($"cms", $"k").as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(estimates(one) === estimates(many))
  }

  test("graft_cms_estimate is callable from SQL after registration") {
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    Seq((1L, 2L)).toDF("a", "b").createOrReplaceTempView("cms_probe_t")
    val est = spark.sql(
      """SELECT graft_cms_estimate(count_min_sketch(a, 0.001d, 0.99d, 42), 1L) AS e
        |FROM cms_probe_t""".stripMargin)
    assert(est.collect().head.getLong(0) === 1L)
  }
}
