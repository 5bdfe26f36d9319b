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

  test("hilbert-ordered layout gives narrow per-file spans in BOTH dimensions") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("hilbert").toString
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
    val files = 16
    orders.repartition(files, col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$dir/plain")
    Layout.writeHilbertOrdered(orders, col("o_custkey"), col("day"),
      s"$dir/hilbert", files)
    def meanSpan(path: String, c: String): Double = {
      val row = Layout.fileSpans(spark.read.parquet(path), col(c))
        .agg(avg(col("span"))).head()
      row.getDouble(0)
    }
    assert(meanSpan(s"$dir/hilbert", "o_custkey") <
      0.5 * meanSpan(s"$dir/plain", "o_custkey"), "custkey spans not clustered")
    assert(meanSpan(s"$dir/hilbert", "day") <
      0.5 * meanSpan(s"$dir/plain", "day"), "day spans not clustered")
    assert(spark.read.parquet(s"$dir/hilbert").count() === orders.count())
  }

  test("hilbert: subtree contiguity, unit-step adjacency, codegen == reference, SQL registration") {
    import spark.implicits._
    import graft.functions.HilbertIndex
    // the 64x64 origin tile is one aligned quadtree subtree, so its
    // 4096 indices must be a CONTIGUOUS distinct block...
    val cells = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val ds = cells.toDF("x", "y")
      .withColumn("h", HilbertIndex(col("x"), col("y")))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val hs = ds.map(_._2)
    assert(hs.distinct.length === 4096 && hs.max - hs.min === 4095L,
      "origin tile is not a contiguous distinct index block")
    // ...and walking that block in index order must take orthogonal
    // UNIT steps — the jump-free property Z-order does not have
    val byH = ds.sortBy(_._2).map(_._1)
    byH.sliding(2).foreach { case Array((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"non-unit step ($x1,$y1)->($x2,$y2)")
    }
    // codegen path (DataFrame eval above) == interpreted reference
    ds.foreach { case ((x, y), h) => assert(h === HilbertIndex.xy2d(x, y)) }
    // SQL registration
    graft.functions.VectorExpressions.register(spark)
    assert(spark.sql("SELECT graft_hilbert(3::long, 5::long) AS h").head().getLong(0)
      === HilbertIndex.xy2d(3L, 5L))
    // driver query: every bucket's in-row tile certification holds
    val q = Layout.hilbertQuery(spark, "/root/testdata/sf0.001").collect()
    assert(q.nonEmpty && q.forall(_.getBoolean(8)), "tile_ok violated")
  }
}
