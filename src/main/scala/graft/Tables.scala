package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table loaders for the driver-generated testdata star schema
  * (TESTDATA.md / FIXTURES.md §2). One method per table so call sites
  * stay typo-proof; all reads go through the vectorized parquet reader
  * and participate in predicate pushdown / column pruning.
  */
object Tables {
  /** Analyzed-DataFrame memo, keyed by (session, path). `spark.read
    * .parquet` is eager on the driver — every call re-lists the
    * directory and re-reads a footer for schema inference — and the
    * bench suite calls each loader hundreds of times (167 queries ×
    * 3 reps × 1-4 tables), so the repeated metadata work is pure
    * fixed overhead. The memo returns the same analyzed plan, which
    * is exactly what a catalog-registered table would give: the
    * underlying `InMemoryFileIndex` is immutable-per-instance, and
    * the testdata directories never change within a process. Keyed by
    * session so a stopped session's stale plans are never served to a
    * new one (specs spin up/tear down sessions).
    */
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    memo.computeIfAbsent((spark, s"$dir/$name.parquet"),
      { key: (SparkSession, String) => spark.read.parquet(key._2) })

  def region(s: SparkSession, dir: String): DataFrame     = table(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame     = table(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame   = table(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame   = table(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame       = table(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame     = table(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame   = table(s, dir, "lineitem")
  /** The events table's `ts` column has changed physical type across
    * testdata generations — parquet TIMESTAMP(NANOS) (which Spark's
    * reader rejects by default, hence `nanosAsLong` + a micros floor)
    * in earlier rounds, plain TIMESTAMP(MICROS) (surfacing as
    * TIMESTAMP_NTZ) in later ones. Adapt on the OBSERVED schema so
    * both generations load to the same session-zone `timestamp`
    * (the session runs UTC, so the NTZ cast is wall-clock identity
    * and every downstream window/oracle contract is unchanged).
    */
  /** NOT computeIfAbsent: the adapted-events memo entry derives from
    * the raw entry via [[table]], and nesting computeIfAbsent inside
    * computeIfAbsent on one ConcurrentHashMap throws
    * `IllegalStateException: Recursive update` whenever the two keys
    * share a hash bin — which depends on the session's identity hash,
    * i.e. a per-JVM coin flip (observed as three stream queries
    * silently erroring in one bench JVM and passing in the next).
    * get-then-putIfAbsent races at worst into one duplicate
    * derivation, which is harmless and lock-free.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    val key = (s, s"$dir/events.parquet#adapted")
    val hit = memo.get(key)
    if (hit != null) hit
    else {
      memo.putIfAbsent(key, eventsUncached(s, dir))
      memo.get(key)
    }
  }

  private def eventsUncached(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => // TIMESTAMP_NTZ: micros precision already, re-zone only
        raw.withColumn("ts",
          expr("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = table(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = table(s, dir, "embeddings")
}
