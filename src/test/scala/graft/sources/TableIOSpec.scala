package graft.sources

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

class TableIOSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def sample = Seq(
    (1L, "en", 10.5, "alpha"),
    (2L, "fr", 20.25, "beta"),
    (3L, "en", 30.75, "gamma")
  ).toDF("id", "lang", "score", "name")

  test("round-trip through every supported format preserves data") {
    TableIO.Formats.foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft-io-$fmt").toString + "/t"
      TableIO.write(sample, dir, fmt)
      val back = TableIO.read(spark, dir, fmt,
        schema = if (fmt == "parquet" || fmt == "orc") None else Some(sample.schema))
      val got = back.orderBy("id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq
      assert(got === sample.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3))).toSeq, s"format=$fmt")
    }
  }

  test("partitioned write lays out directories and prunes on read") {
    val dir = Files.createTempDirectory("graft-io-part").toString + "/t"
    TableIO.writePartitioned(sample, dir, Seq("lang"))
    assert(new java.io.File(s"$dir/lang=en").isDirectory)
    assert(new java.io.File(s"$dir/lang=fr").isDirectory)
    val pruned = TableIO.read(spark, dir).filter(col("lang") === "en")
    assert(pruned.count() === 2)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected partition pruning in plan:\n$scan")
  }

  test("bucketed tables join without a shuffle") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.nonEmpty)
    val left = (1L to 100L).map(i => (i, s"name$i")).toDF("k", "name")
    val right = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "v")
    TableIO.writeBucketed(left, "b_left", "k", 4)
    TableIO.writeBucketed(right, "b_right", "k", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val joined = spark.table("b_left").join(spark.table("b_right"), "k")
      assert(joined.count() === 100)
      val shuffles = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
      assert(shuffles.isEmpty,
        s"bucketed join should be shuffle-free:\n${joined.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_left")
      spark.sql("DROP TABLE IF EXISTS b_right")
    }
  }

  test("append mode accumulates rows") {
    val dir = Files.createTempDirectory("graft-io-append").toString + "/t"
    TableIO.write(sample, dir)
    TableIO.write(sample, dir, mode = SaveMode.Append)
    assert(TableIO.read(spark, dir).count() === 6)
  }

  test("schema evolution: widened writers merge; old files read the new column as null") {
    // a 100 TB table is written over months by evolving jobs — new
    // columns must be additive, never a rewrite of old files
    val dir = Files.createTempDirectory("graft-io-evolve").toString + "/t"
    TableIO.write(sample, dir)
    TableIO.write(sample.withColumn("quality", col("score") * 2), dir,
      mode = SaveMode.Append)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "lang", "score", "name", "quality"))
    assert(merged.count() === 6)
    // rows from pre-evolution files surface the new column as null
    assert(merged.filter(col("quality").isNull).count() === 3)
    assert(merged.filter(col("quality") === col("score") * 2).count() === 3)
  }

  test("streaming file-source ingest: files appearing in a directory flow through a stream") {
    val srcDir = Files.createTempDirectory("graft-io-stream-src").toString
    val out = "file_stream_out"
    TableIO.write(sample, srcDir + "/batch1", mode = SaveMode.Overwrite)
    // move the written part-files up so the stream source sees a flat dir
    val q = spark.readStream
      .schema(sample.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir + "/batch1")
      .groupBy(col("lang")).count()
      .writeStream.format("memory").queryName(out)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val counts = spark.table(out).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts === Map("en" -> 2L, "fr" -> 1L))
      // a file landing AFTER the stream started is picked up incrementally
      sample.filter(col("lang") === "en").limit(1)
        .write.mode(SaveMode.Append).parquet(srcDir + "/batch1")
      q.processAllAvailable()
      val counts2 = spark.table(out).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts2("en") === 3L)
    } finally q.stop()
  }
}
