package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1 "scans/sources/sinks: none
  * locally" — the engine owns them). Thin, explicit wrappers over the
  * DataFrame reader/writer so call sites declare intent; the two
  * write layouts that matter at 100 TB get first-class helpers:
  *
  *  - [[writePartitioned]]: hive-style directory partitioning —
  *    partition pruning turns predicates on the partition column into
  *    directory skips (PartitionFilters in the scan, zero I/O for
  *    pruned values).
  *  - [[writeBucketed]]: pre-shuffled bucket layout registered in the
  *    session catalog — equi-joins and aggregations on the bucket key
  *    skip their Exchange entirely (verified by spec: the joined plan
  *    contains no shuffle).
  */
object TableIO {

  val Formats: Seq[String] = Seq("parquet", "orc", "json", "csv")

  def read(spark: SparkSession, path: String, format: String = "parquet",
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val withSchema = schema.fold(
      // self-describing formats carry their schema; text formats must
      // be told (csv) or asked to sample (json) — never infer csv
      // types silently
      if (format == "csv") r.option("header", "true").option("inferSchema", "true") else r
    )(s => if (format == "csv") r.option("header", "true").schema(s) else r.schema(s))
    withSchema.load(path)
  }

  def write(df: DataFrame, path: String, format: String = "parquet",
            mode: SaveMode = SaveMode.Overwrite): Unit =
    base(df, format).mode(mode).save(path)

  /** Directory-partitioned write. Partition columns become path
    * segments; pick low-cardinality keys (date, lang, source) or the
    * file count explodes.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       format: String = "parquet",
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    base(df, format).mode(mode).partitionBy(partitionCols: _*).save(path)

  /** Bucketed + sorted table in the session catalog. Both sides of a
    * recurring join written with the same bucket count/key make the
    * join shuffle-free forever after — the classic amortize-one-
    * shuffle-across-all-future-queries layout.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  private def base(df: DataFrame, format: String): DataFrameWriter[Row] = {
    val w = df.write.format(format)
    if (format == "csv") w.option("header", "true") else w
  }
}
