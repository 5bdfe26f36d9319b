package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import EventStreams.Event

/** Stream-stream join and streaming dedup — the two stateful shapes
  * not covered by EventStreamsSpec. Both rely on watermarks to bound
  * join/dedup state, which is what makes them viable on unbounded
  * input.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join matches purchases to recent clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Event]
    val clicks = MemoryStream[Event]

    val p = purchases.toDF().select(col("event_id").as("p_id"), col("user_id").as("p_user"),
      col("ts").as("p_ts")).withWatermark("p_ts", "1 hour")
    val c = clicks.toDF().select(col("event_id").as("c_id"), col("user_id").as("c_user"),
      col("ts").as("c_ts")).withWatermark("c_ts", "1 hour")

    // click within 30 minutes BEFORE the purchase
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))

    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        Event(10, ts("2024-01-01 09:40:00"), 1, "click", 0), // within window
        Event(11, ts("2024-01-01 08:00:00"), 1, "click", 0), // too old
        Event(12, ts("2024-01-01 09:50:00"), 2, "click", 0)) // other user
      purchases.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "purchase", 9.99))
      q.processAllAvailable()
      val rows = spark.table("ss_join").collect()
      assert(rows.map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("c_id"))).toSet === Set((1L, 10L)))
    } finally q.stop()
  }

  test("streaming dedup with watermark drops re-deliveries of the same event id") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val deduped = input.toDF()
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:05"), 1, "click", 1.0), // same id, redelivered
        Event(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts("2024-01-01 10:02:00"), 1, "click", 1.0)) // still within watermark
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").collect().map(_.getAs[Long]("event_id")).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming span dedup reproduces the batch keeper set on doc-ordered input") {
    import EventStreams.Span
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "unique one. shared banner. tail one"),
      (2L, "shared banner. unique two"),
      (3L, "unique three. shared banner. another shared"),
      (4L, "another shared. unique four"))
    val spans = docs.flatMap { case (id, text) =>
      text.split("\\.").map(_.trim).filter(_.nonEmpty).zipWithIndex
        .map { case (s, p) => Span(id, p, s) }
    }
    val input = MemoryStream[Span]
    val q = EventStreams.dedupSpans(input.toDS())
      .writeStream.format("memory").queryName("span_dedup")
      .outputMode(OutputMode.Append()).start()
    try {
      // two doc-ordered micro-batches (docs 1-2, then 3-4)
      input.addData(spans.filter(_.doc_id <= 2): _*)
      q.processAllAvailable()
      input.addData(spans.filter(_.doc_id > 2): _*)
      q.processAllAvailable()
      val streamed = spark.table("span_dedup").collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("sent"))).toSet
      // batch twin's keeper set: first (doc_id, pos) per distinct span
      val batchKept = spans.groupBy(_.sent).values.map { ss =>
        val f = ss.minBy(s => (s.doc_id, s.pos)); (f.doc_id, f.sent)
      }.toSet
      assert(streamed === batchKept)
      // every span text survives exactly once
      assert(streamed.size === spans.map(_.sent).distinct.length)
    } finally q.stop()
  }
}
