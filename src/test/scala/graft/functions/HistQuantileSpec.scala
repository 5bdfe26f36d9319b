package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistQuantileSpec extends SparkSpec {
  import spark.implicits._

  test("estimate lands within width/2 of the exact rank value on a known distribution") {
    val vals = (1 to 1000).map(_.toDouble)
    val df = vals.toDF("v")
    val est = df.agg(HistQuantile(col("v"), 0.0, 1000.0, 100, 0.5).as("e"))
      .as[Double].head
    // rank 500 → value 500.0 → bucket 50 (cum through bucket 49 is
    // 9 + 49·10 = 499) → midpoint 505.0; |505 − 500| = width/2
    assert(est === 505.0)
    assert(math.abs(est - 500.0) <= 5.0 + 1e-9)
    val p99 = df.agg(HistQuantile(col("v"), 0.0, 1000.0, 100, 0.99).as("e"))
      .as[Double].head
    assert(math.abs(p99 - 990.0) <= 5.0 + 1e-9)
  }

  test("sketch is merge-order-proof: estimate identical across any partitioning") {
    val vals = (1 to 5000).map(i => ((i * 2654435761L) % 10000).toDouble)
    val ests = Seq(1, 3, 7, 32).map { parts =>
      vals.toDF("v").repartition(parts)
        .agg(HistQuantile(col("v"), 0.0, 10000.0, 64, 0.9).as("e"))
        .as[Double].head
    }
    assert(ests.distinct.size === 1, s"partitioning changed the estimate: $ests")
  }

  test("out-of-range values clamp to edge buckets; empty input yields null") {
    val est = Seq(-100.0, -5.0, 25.0, 9999.0).toDF("v")
      .agg(HistQuantile(col("v"), 0.0, 100.0, 10, 0.5).as("e")).as[Double].head
    // buckets: -100 and -5 clamp to bucket 0, 25 → bucket 2, 9999
    // clamps to bucket 9; rank 2 of 4 lands in bucket 0 → midpoint 5
    assert(est === 5.0)
    val empty = Seq.empty[Double].toDF("v")
      .agg(HistQuantile(col("v"), 0.0, 100.0, 10, 0.5).as("e")).collect()
    assert(empty.head.isNullAt(0))
  }

  test("SQL registration: graft_hist_quantile works with GROUP BY") {
    VectorExpressions.register(spark)
    Seq((1, 10.0), (1, 20.0), (1, 30.0), (2, 100.0)).toDF("g", "v")
      .createOrReplaceTempView("hq_in")
    val rows = spark.sql(
      """SELECT g, graft_hist_quantile(v, 0.0D, 200.0D, 20, 0.5D) AS e
        |FROM hq_in GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(rows.length === 2)
    // group 1: rank 2 of 3 → 20.0 → bucket 2 midpoint 25.0
    assert(rows(0).getDouble(1) === 25.0)
    // group 2: single value 100 → bucket 10 midpoint 105.0
    assert(rows(1).getDouble(1) === 105.0)
  }
}
