package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** End-to-end Structured Streaming demo over the real testdata: treats
  * the events parquet as a file-source stream (one file per
  * micro-batch), runs the watermarked hourly aggregation, and prints
  * finalized windows. Run:
  *
  *   sbt "runMain graft.streaming.StreamDemo /root/testdata/sf0.001"
  *
  * Demonstrates the production wiring (`readStream` → transform →
  * `writeStream`) around the same [[EventStreams]] transforms the
  * MemoryStream specs cover.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // File stream sources consume a DIRECTORY of arriving files —
    // stage the events file into a scratch inbox, then drop a second
    // copy mid-stream to show incremental micro-batch processing.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val inbox = Files.createTempDirectory("graft-stream-inbox")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      inbox.resolve("batch1.parquet"), StandardCopyOption.REPLACE_EXISTING)

    // The stream schema must match the file's physical `ts` type,
    // which differs across testdata generations (nanos-as-long vs
    // native micros) — take it from a batch read of the same file,
    // then normalize to a session-zone timestamp like graft.Tables.
    val schema: StructType =
      spark.read.parquet(s"$sfDir/events.parquet").schema
    val tsIsLong =
      schema("ts").dataType == org.apache.spark.sql.types.LongType
    val stream0 = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inbox.toString)
    val stream =
      if (tsIsLong)
        stream0.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else
        stream0.withColumn("ts",
          expr("ts").cast(org.apache.spark.sql.types.TimestampType))

    val q = EventStreams.hourlyCounts(stream, watermark = "30 minutes")
      .writeStream
      .format("memory").queryName("stream_demo")
      .outputMode(OutputMode.Append())
      .start()
    q.processAllAvailable()
    val afterBatch1 = spark.table("stream_demo").count()

    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      inbox.resolve("batch2.parquet"), StandardCopyOption.REPLACE_EXISTING)
    q.processAllAvailable()
    val finalized = spark.table("stream_demo")
    val n = finalized.count()
    finalized.orderBy("window_start", "event_type").show(8, truncate = false)
    println(s"[stream-demo] finalized windows after batch1: $afterBatch1, " +
      s"after batch2: $n (append mode — the tail hour stays open until a " +
      "later watermark closes it; batch2 re-delivers the same hours, so " +
      "only the watermark moved)")
    q.stop()
    spark.stop()
  }
}
