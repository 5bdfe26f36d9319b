package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Morton (Z-order) interleaving so a
  * table clustered on the curve is simultaneously range-local in ALL
  * interleaved dimensions. At 100 TB this is what makes selective
  * scans cheap: parquet files written along the curve carry narrow
  * min/max ranges for every dimension, so a predicate on EITHER
  * column skips most files via footer stats — a single-column sort
  * gives that for one dimension and destroys it for the others.
  *
  * The z-value is pure bit arithmetic (shift/and/or) — codegen'd,
  * map-stage, and reproducible in ANSI SQL, so the curve itself is
  * oracle-checkable.
  */
object Layout {

  /** Spread the low 16 bits of `c` to even bit positions (classic
    * mask-doubling sequence).
    */
  private def spread16(c: Column): Column = {
    val v0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code interleaving two 16-bit coordinates: bit i of
    * `x` lands at position 2i, of `y` at 2i+1.
    */
  def mortonZ(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Write `df` clustered along the z-curve of (xCol, yCol):
    * range-partition by z (so files own contiguous curve segments),
    * sort within partitions, drop the helper column. `numFiles`
    * bounds output file count — at scale you'd size it from the
    * target file size instead.
    *
    * Each dimension is NORMALIZED to the full 16-bit range via its
    * observed min/max before interleaving. Raw interleaving silently
    * degrades to a single-column sort whenever the dimensions use
    * mismatched bit widths (an 11-bit key interleaved with a 14-bit
    * day leaves the curve's coarse splits entirely to the wider
    * column — the narrow one's high bits are constant zero), which is
    * why production z-order implementations bucket per column first.
    * Uniform min/max buckets suffice for roughly uniform columns;
    * heavily skewed columns would want rank/quantile buckets instead.
    * The stats pass is one map-side-combinable aggregate.
    */
  def writeZOrdered(df: DataFrame, xCol: Column, yCol: Column,
                    outDir: String, numFiles: Int): Unit =
    writeCurveOrdered(df, xCol, yCol, outDir, numFiles, mortonZ)

  /** The shared layout core behind BOTH curve writers (review
    * finding: the Hilbert path duplicated the min/max pass, the
    * empty-input guard and the bucket law wholesale — a fix to the
    * shared normalization would have had to land twice): normalize
    * each dimension to the 16-bit range via its observed min/max,
    * index with `curve`, range-partition along the index, sort
    * within partitions, drop the helper column.
    */
  private def writeCurveOrdered(df: DataFrame, xCol: Column, yCol: Column,
                                outDir: String, numFiles: Int,
                                curve: (Column, Column) => Column): Unit = {
    val b = df.agg(
      min(xCol).cast("double"), max(xCol).cast("double"),
      min(yCol).cast("double"), max(yCol).cast("double")).head()
    if (b.isNullAt(0)) {
      // empty (or all-null-key) input: no curve to lay out — write the
      // empty relation instead of NPE-ing on the null min
      df.write.mode("overwrite").parquet(outDir)
      return
    }
    def bucket16(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else width_bucket(c.cast("double"), lit(lo), lit(hi + 1e-9), lit(65536)) - lit(1L)
    df.withColumn("_c", curve(
        bucket16(xCol, b.getDouble(0), b.getDouble(1)),
        bucket16(yCol, b.getDouble(2), b.getDouble(3))))
      .repartitionByRange(numFiles, col("_c"))
      .sortWithinPartitions(col("_c"))
      .drop("_c")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Per-file clustering quality: for each parquet file, the span
    * (max-min) of a column — the width the file's footer stats would
    * advertise to a scan planner. Mean span ≈ corpus span means no
    * skipping; small mean span means most files prune out of a
    * selective scan.
    */
  def fileSpans(df: DataFrame, c: Column): DataFrame =
    df.withColumn("_file", input_file_name())
      .groupBy(col("_file"))
      .agg((max(c) - min(c)).as("span"), count(lit(1)).as("n_rows"))

  /** Driver query: z-bucket summary of orders on
    * (customer, order-day). Each coarse curve bucket covers a narrow
    * rectangle in (custkey, day) space — the locality the layout
    * exploits — and the bucket extents are exact integers, so the
    * oracle checks the curve arithmetic itself.
    */
  def zorderQuery(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
    graft.Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        mortonZ(col("o_custkey") % 65536, day % 65536).as("z"), day.as("day"))
      .groupBy(floor(col("z") / lit(1048576.0)).cast("long").as("z_bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        min(col("o_custkey")).as("min_cust"),
        max(col("o_custkey")).as("max_cust"),
        min(col("day")).cast("long").as("min_day"),
        max(col("day")).cast("long").as("max_day"))
      .orderBy(col("z_bucket"))
  }

  /** Write `df` clustered along the HILBERT curve of (xCol, yCol) —
    * same normalization and range-partition discipline as
    * [[writeZOrdered]], but on [[graft.functions.HilbertIndex]]: the
    * Hilbert curve never jumps (consecutive indices are orthogonal
    * unit steps), so contiguous files cover compact rectangles with
    * none of the Z-curve's diagonal seam-crossings — tighter footer
    * min/max on BOTH dimensions for the same file count.
    */
  def writeHilbertOrdered(df: DataFrame, xCol: Column, yCol: Column,
                          outDir: String, numFiles: Int): Unit =
    writeCurveOrdered(df, xCol, yCol, outDir, numFiles,
      (x, y) => graft.functions.HilbertIndex(x.cast("long"), y.cast("long")))

  /** Driver query: Hilbert-bucket summary of orders on (customer,
    * order-day) — the [[zorderQuery]] twin on the jump-free curve,
    * with the tile containment CERTIFIED IN-ROW: every 2²⁰-index
    * bucket is exactly one depth-6 quadtree subtree, so all its
    * cells must sit inside one aligned 1024×1024 tile — `tile_ok`
    * pins span_x ≤ 1023 AND span_y ≤ 1023 on every emitted row, and
    * the oracle re-derives the full 16-round curve arithmetic, so a
    * single wrong rotation anywhere breaks both the spans and the
    * hash.
    */
  def hilbertQuery(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    graft.Tables.orders(s, dir)
      .select((col("o_custkey") % 65536L).cast("long").as("x"),
        (day % 65536L).as("y"))
      .withColumn("h", graft.functions.HilbertIndex(col("x"), col("y")))
      .groupBy(floor(col("h") / lit(1048576.0)).cast("long").as("h_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .withColumn("span_x", col("max_x") - col("min_x"))
      .withColumn("span_y", col("max_y") - col("min_y"))
      .withColumn("tile_ok", col("span_x") <= 1023L && col("span_y") <= 1023L)
      .orderBy(col("h_bucket"))
  }
}
