package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference deinterleave for the round-trip check. */
  private def unmorton(z: Long): (Long, Long) = {
    def compact(v0: Long): Long = {
      var v = v0 & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0F0F0F0F0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FF00FF00FFL
      (v | (v >> 8)) & 0x0000FFFF0000FFFFL
    }
    (compact(z), compact(z >> 1))
  }

  test("mortonZ round-trips both coordinates bit-exactly") {
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (255L, 256L), (32768L, 1L))
    val out = samples.toDF("x", "y")
      .select(col("x"), col("y"), Layout.mortonZ(col("x"), col("y")).as("z"))
      .collect()
    out.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(unmorton(z) === ((x, y)), s"bad interleave for ($x,$y): z=$z")
    }
  }

  test("z-ordered layout gives narrow per-file spans in BOTH dimensions") {
    val dir = Files.createTempDirectory("zorder").toString
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
    // 16 files = 4 coarse curve bits = two binary splits in EACH
    // dimension (y,x,y,x) — the smallest layout where both
    // dimensions' spans must shrink
    val files = 16
    // baseline: same file count, clustered on NOTHING (hash of the key)
    orders.repartition(files, col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/plain")
    Layout.writeZOrdered(orders, col("o_custkey"), col("day"),
      s"$dir/zorder", files)
    def meanSpan(path: String, c: String): Double = {
      val row = Layout.fileSpans(spark.read.parquet(path), col(c))
        .agg(avg(col("span"))).head()
      row.getDouble(0)
    }
    // both interleaved dimensions must come out MUCH narrower per file
    // than the unclustered layout (footer min/max would prune scans)
    assert(meanSpan(s"$dir/zorder", "o_custkey") < 0.5 * meanSpan(s"$dir/plain", "o_custkey"),
      "custkey spans not clustered")
    assert(meanSpan(s"$dir/zorder", "day") < 0.5 * meanSpan(s"$dir/plain", "day"),
      "day spans not clustered")
    // and the data survives the layout unchanged
    assert(spark.read.parquet(s"$dir/zorder").count() === orders.count())
  }
}
