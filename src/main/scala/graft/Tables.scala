package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table loaders for the driver-generated testdata star schema
  * (TESTDATA.md / FIXTURES.md §2). One method per table so call sites
  * stay typo-proof; all reads go through the vectorized parquet reader
  * and participate in predicate pushdown / column pruning.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame     = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = table(s, dir, "lineitem")
  /** The events table carries parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects by default. Read nanos as raw longs and floor to
    * microseconds — Spark's native timestamp precision. (DuckDB reads
    * the same file at nano precision, so oracle queries must truncate
    * to seconds before comparing; see graft.operators.Events.)
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
