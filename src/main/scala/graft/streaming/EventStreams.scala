package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One pending (not yet watermark-finalized) session. Top-level (not
  * nested in the object) so the state encoder's generated code can
  * construct it.
  */
final case class SessionAcc(start: Long, end: Long, n: Long, total: Double)

/** Stream state per user: ALL sessions the watermark has not yet
  * sealed, ordered by start. More than one can be pending at once —
  * an out-of-order event older than (open-session start − gap) opens
  * its own earlier session, and that stray must stay mergeable with
  * further strays and with late in-gap arrivals until the watermark
  * passes its end + gap.
  */
final case class SessionState(pending: List[SessionAcc])

/** One finalized hourly count in the anomaly baseline. */
final case class HourCount(hour: Long, n: Long)

/** Streaming anomaly-detector state per event type: counts for hours
  * the watermark has not yet sealed, plus the trailing window of
  * finalized hourly baselines. Top-level for the state encoder.
  */
final case class AnomalyState(pending: Map[Long, Long], history: List[HourCount])

/** Structured Streaming surface (SURVEY.md §7.1 item 8): the true
  * streaming analogues of the batch `graft.operators.Events` queries.
  * Transforms are expressed as Dataset→Dataset functions so they run
  * identically on `readStream` sources in production and on
  * MemoryStream in tests; the driver's oracle checks the batch twins
  * instead (a streaming sink can't be hash-compared).
  *
  * Scale notes: both operators keyed-partition by user/window —
  * state is sharded across executors by the shuffle, watermarks bound
  * state size, and `flatMapGroupsWithState` evicts sessions on event-
  * time timeout, so state never grows with total history, only with
  * concurrently-open keys.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long, total_value: Double)

  /** Tumbling-window counts with a watermark: late data beyond
    * `watermark` is dropped, windows finalize (append mode) once the
    * watermark passes their end.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** STATE-STORE PARTITION SIZING for the driver-gated streaming
    * entries: a streaming query's stateful-operator partition count
    * is fixed from `spark.sql.shuffle.partitions` at FIRST start and
    * every micro-batch pays one state-store commit per partition —
    * so it must be sized to the KEYSPACE (hour×type windows, live
    * user keys), not inherited from the batch suite's corpus-sized
    * default. 32 stores for a few hundred keys is 8× commit overhead
    * for zero parallelism win. The conf flips only around `start()`
    * (partition count is captured into the checkpoint there) and is
    * restored before returning, so batch queries never see it.
    */
  private def withStatePartitions[A](s: org.apache.spark.sql.SparkSession,
                                     n: Int)(start: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try start finally s.conf.set(key, prev)
  }

  /** TRUE STREAMING driver entry: run [[hourlyCounts]] as an actual
    * `StreamingQuery` — `readStream` over the events parquet,
    * `Trigger.AvailableNow` (the batch-bounded streaming trigger:
    * process everything currently in the source, then stop), memory
    * sink — and return the sink table shaped exactly like the batch
    * `ev_hourly` oracle (minus the non-streamable countDistinct).
    * This exercises the streaming RUNTIME path end to end —
    * state-store config, watermark wiring, file-source listing, sink
    * commit — which the MemoryStream specs cover only in-process; a
    * regression that breaks only that wiring now fails the driver
    * gate, not just ScalaTest. Complete output mode because the
    * driver compares the FULL aggregate (append mode would withhold
    * the unfinalized tail windows past the watermark); hourly×type
    * cardinality is bounded, so complete-mode state is model-sized at
    * any stream length.
    */
  def runHourlyAvailableNow(s: org.apache.spark.sql.SparkSession,
                            dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
    // the streaming file source lists a DIRECTORY; the testdata dir
    // holds one file per table, so a glob filter scopes the listing
    // to the events file
    val src = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    // unique sink name: Verify and each bench rep start a fresh query
    val sink = s"stream_hourly_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      hourlyCounts(src)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    s.table(sink)
      .select(col("window_start").as("hour"), col("event_type"),
        col("n_events"), round(col("total_value"), 2).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** STREAMED FORECAST (r11 — the ELEVENTH driver-gated streaming
    * runtime): daily event counts aggregated by a real
    * `StreamingQuery` (readStream over the events parquet →
    * watermarked 1-day tumbling window → Complete-mode memory sink
    * under Trigger.AvailableNow), then the SAME Holt-Winters +
    * split-conformal serve ([[graft.operators.Events.holtWintersOf]])
    * over the streamed dailies. The driver entry shares
    * `ev_forecast`'s DuckDB oracle VERBATIM (the stream_collection
    * discipline): streamed ≡ batch holds by construction — the
    * streamed daily agg produces exactly the batch `daily0` rows
    * (UTC tumbling windows align with the epoch-day buckets) — and
    * any drift in the streaming agg path breaks the HASH, not just a
    * spec. Day×nothing cardinality is time-span-bounded, so
    * complete-mode state is model-sized at any stream length.
    */
  def runForecastAvailableNow(s: org.apache.spark.sql.SparkSession,
                              dir: String): DataFrame =
    graft.operators.Events.holtWintersOf(
      streamedDaily(s, dir, "stream_forecast", byType = false), horizon = 14)

  /** Shared daily-count ingest behind the forecast / changepoint /
    * correlogram streamed twins (review finding: three verbatim
    * copies of the readStream → watermark → 1-day tumbling agg →
    * Complete-mode memory sink scaffold, plus inline re-declarations
    * of the shared [[EventSchema]]): runs the real `StreamingQuery`
    * under `Trigger.AvailableNow` and returns the streamed daily
    * frame — (day_d, n), or (event_type, day_d, n) when `byType` —
    * frozen via localCheckpoint so downstream cores may self-join it
    * (a MemorySink-backed view resolves both sides of a self-join to
    * the same attribute ids). Day(×type) cardinality is
    * time-span-bounded, so complete-mode state AND the frozen frame
    * are model-sized at any stream length.
    */
  private def streamedDaily(s: org.apache.spark.sql.SparkSession,
                            dir: String, sinkPrefix: String,
                            byType: Boolean): DataFrame = {
    val src = s.readStream.schema(EventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val sink = s"${sinkPrefix}_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val keys =
      if (byType) Seq(col("event_type"), window(col("ts"), "1 day"))
      else Seq(window(col("ts"), "1 day"))
    val outCols =
      (if (byType) Seq(col("event_type")) else Nil) ++ Seq(
        floor(col("window.start").cast("long") / 86400L)
          .cast("long").as("day_d"), col("n"))
    val q = withStatePartitions(s, 4) {
      src.withWatermark("ts", "1 hour")
        .groupBy(keys: _*)
        .agg(count(lit(1)).as("n"))
        .select(outCols: _*)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    s.table(sink).localCheckpoint(true)
  }

  /** Streamed CHANGEPOINT detection — the TWELFTH driver-gated
    * streaming runtime: the identical checkpointless AvailableNow
    * ingest shape as [[runForecastAvailableNow]] (readStream events
    * parquet → watermarked 1-day tumbling agg → Complete-mode memory
    * sink) feeding the SAME exact-integer binary-segmentation core as
    * the batch `ev_changepoints`. UTC tumbling windows align with
    * epoch-day buckets, so streamed ≡ batch by construction and the
    * driver entry shares `ev_changepoints`' DuckDB oracle VERBATIM —
    * any drift in the streaming agg path breaks the hash. The
    * ingest-drift detector, running where drift actually arrives:
    * on the stream.
    */
  def runChangepointsAvailableNow(s: org.apache.spark.sql.SparkSession,
                                  dir: String): DataFrame =
    graft.operators.Events.changepointsOf(
      streamedDaily(s, dir, "stream_cp", byType = false))

  /** Streamed AUTOCORRELATION — the THIRTEENTH driver-gated streaming
    * runtime, and the first whose streamed aggregate is PER-KEY (the
    * forecast/changepoint twins aggregate globally): readStream →
    * watermarked (event_type × 1-day tumbling window) agg →
    * Complete-mode memory sink, feeding the SAME exact-integer
    * correlogram core as the batch `ev_acf`. UTC windows align with
    * epoch-day buckets, so streamed ≡ batch by construction and the
    * driver entry shares `ev_acf`'s DuckDB oracle VERBATIM — the
    * seasonality detector runs where the seasons actually arrive.
    */
  def runAcfAvailableNow(s: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame =
    graft.operators.Events.acfOf(
      streamedDaily(s, dir, "stream_acf", byType = true))

  /** HOPPING-window counts with a watermark — the streaming twin of
    * `graft.operators.Events.hopping`: `window(ts, 1h, 15m)` expands
    * each admitted event into its 4 overlapping windows map-side;
    * state is one row per open (window, type) — bounded by the
    * watermark horizon, not the stream length.
    */
  def hoppingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming HEAVY HITTERS state: the count-min sketch itself as
    * the streaming aggregate — `count_min_sketch` is an algebraic
    * (mergeable) aggregate, so Structured Streaming keeps ONE
    * sketch-sized state blob per grouping key regardless of how many
    * distinct values flow past: the memory contract that makes
    * frequency tracking viable on an unbounded 100 TB/day stream
    * where exact per-key streaming state (`groupBy(key).count`) would
    * grow without bound. Complete-mode output; estimates are read
    * from the emitted sketch with the same
    * [[graft.functions.CmsEstimate]] expression as the batch
    * `q35_heavy_hitters`, and because CMS cell updates commute, the
    * final streamed sketch is BIT-FOR-BIT the batch sketch on the
    * same admitted data (parity spec in EventStreamsSpec).
    */
  def cmsState(events: DataFrame, keyCol: String,
               eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): DataFrame =
    events.groupBy()
      .agg(expr(s"count_min_sketch($keyCol, ${eps}d, ${confidence}d, $seed)").as("cms"),
        count(lit(1)).as("n_total"))

  /** Gap-based sessionization with explicit state: sessions close
    * after `gapSeconds` of user inactivity (event-time, enforced via
    * watermark timeout). The streaming twin of
    * `graft.operators.Events.sessions`.
    *
    * Parity with the batch twin for every event the watermark admits:
    * each micro-batch merges the incoming events with ALL pending
    * sessions by a single start-ordered sweep (any two intervals
    * within `gap` coalesce — strays merge with each other and late
    * in-gap arrivals extend earlier strays), and a session is emitted
    * only once the watermark strictly passes its end + gap, at which
    * point no admissible event (ts ≥ watermark) can still coalesce
    * with it.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800,
                 watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    /** Coalesce start-sorted intervals whose gap is ≤ gapMs. */
    def sweep(sorted: List[SessionAcc]): List[SessionAcc] =
      sorted.foldLeft(List.empty[SessionAcc]) {
        case (cur :: done, next) if next.start - cur.end <= gapMs =>
          SessionAcc(cur.start, math.max(cur.end, next.end),
            cur.n + next.n, cur.total + next.total) :: done
        case (acc, next) => next :: acc
      }.reverse

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      val wm = state.getCurrentWatermarkMs()
      val prior = state.getOption.map(_.pending).getOrElse(Nil)
      val fresh = batch.toList.map(e => SessionAcc(e.ts.getTime, e.ts.getTime, 1L, e.value))
      val merged =
        if (fresh.isEmpty) prior // timeout wake-up: nothing new to merge
        else sweep((prior ++ fresh).sortBy(s => (s.start, s.end)))
      // Ripe = no admissible future event can coalesce: an event with
      // ts == end + gap would still merge, and ts ≥ wm is admissible,
      // so finalize only when end + gap < wm (strict).
      val (ripe, keep) = merged.partition(s => s.end + gapMs < wm)
      if (keep.isEmpty) state.remove()
      else {
        state.update(SessionState(keep))
        // Wake when the earliest pending session becomes ripe; the
        // timestamp must stay ahead of the current watermark.
        state.setTimeoutTimestamp(math.max(keep.map(_.end + gapMs).min, wm + 1L))
      }
      ripe.iterator.map(s =>
        Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total))
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** TRUE STREAMING driver entry for [[sessionize]] — the
    * `flatMapGroupsWithState` + event-time-timeout runtime path the
    * other two driver streams don't touch. Append-mode stateful
    * output only finalizes once the watermark passes, so a bounded
    * replay would withhold every session near the stream's end; the
    * standard production answer is a CLOSE-THE-BOOKS event, staged
    * here explicitly: the source directory is a copy of the events
    * file plus one sentinel event (user −1) far enough past max(ts)
    * that the final watermark ripens every real session. The
    * single-batch ingest plus the no-data flush micro-batch then
    * drain the state store before AvailableNow terminates. The sink
    * reshapes to EXACTLY the batch `ev_sessions` oracle (session_seq
    * re-derived by a per-user window over closed sessions), so the
    * DuckDB gate hash-compares the streaming runtime end to end.
    */
  /** Stage a bounded replay source: a copy of the events file plus
    * one close-the-books sentinel event (user −1) `marginMs` past
    * max(ts), written last so the file source processes it in its own
    * final micro-batch and the watermark it advances ripens/seals all
    * real state before AvailableNow terminates. Returns the staged
    * directory for `readStream`.
    */
  /** Staged-source memo: the staged directory is a pure function of
    * (events file, margin) and immutable once written, but each bench
    * rep used to re-stage it — a full events-file copy, a max(ts)
    * Spark job and a parquet write charged to EVERY invocation of the
    * three sentinel-gated stream queries. Stage once per (dir,
    * margin) per JVM; reps and the warmup reuse the directory.
    */
  private val stageMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), String]()

  private def stageWithSentinel(s: org.apache.spark.sql.SparkSession,
                                dir: String, marginMs: Long): String =
    stageMemo.computeIfAbsent((dir, marginMs),
      { _: (String, Long) => stageWithSentinelUncached(s, dir, marginMs) })

  private def stageWithSentinelUncached(s: org.apache.spark.sql.SparkSession,
                                        dir: String, marginMs: Long): String = {
    import s.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft-stream-src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "events.parquet"),
      stage.resolve("events.parquet"))
    val maxTs = graft.Tables.events(s, dir)
      .agg(org.apache.spark.sql.functions.max(col("ts"))).head().getTimestamp(0)
    val sentinelTs = new Timestamp(maxTs.getTime + marginMs)
    val scratch = stage.resolve("_sentinel_scratch")
    Seq((-1L, sentinelTs, -1L, "sentinel", 0.0, null: String))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(scratch.toString)
    val part = java.nio.file.Files.list(scratch).iterator()
    var sentinelFile: java.nio.file.Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) sentinelFile = p
    }
    // written AFTER the events copy → later mtime → processed last
    java.nio.file.Files.move(sentinelFile, stage.resolve("zz_sentinel.parquet"))
    stage.toString
  }

  private val EventSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING")

  def runSessionsAvailableNow(s: org.apache.spark.sql.SparkSession,
                              dir: String): DataFrame = {
    import s.implicits._
    // watermark delay (1 h) + session gap (30 min) + strictness margin
    val stage = stageWithSentinel(s, dir, (3600L + 1800L + 2L) * 1000L)
    val src = s.readStream.schema(EventSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(stage)
      .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val sink = s"stream_sessions_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      sessionize(src)
        .toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    val wSeq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("session_start"))
    s.table(sink)
      .filter(col("user_id") >= 0) // drop the close-the-books sentinel
      .withColumn("session_seq",
        org.apache.spark.sql.functions.row_number().over(wSeq).cast("long"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("session_start"), col("session_end"),
        (col("session_end").cast("long") - col("session_start").cast("long"))
          .as("duration_sec"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** TRUE STREAMING driver entry for [[transitions]] — the
    * out-of-order buffering + watermark-sealed ordering runtime with
    * the frontier-TTL state bound. Same close-the-books discipline as
    * [[runSessionsAvailableNow]] (margin = watermark delay + margin —
    * sealing only needs the final watermark past every real second);
    * the emitted per-user pair stream then aggregates to EXACTLY the
    * batch Markov-transition oracle (counts, distinct users, and the
    * per-state probability), so the driver hash-checks this stateful
    * runtime end to end as well.
    */
  def runTransitionsAvailableNow(s: org.apache.spark.sql.SparkSession,
                                 dir: String): DataFrame = {
    import s.implicits._
    val stage = stageWithSentinel(s, dir, (3600L + 2L) * 1000L)
    val src = s.readStream.schema(EventSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(stage)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    val sink = s"stream_transitions_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      transitions(src)
        .toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    val byState = org.apache.spark.sql.expressions.Window.partitionBy(col("state"))
    s.table(sink)
      .filter(col("user_id") >= 0) // drop the close-the-books sentinel
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("n_transitions"),
        org.apache.spark.sql.functions.countDistinct(col("user_id")).as("n_users"))
      .withColumn("p", graft.operators.CrossEngine.rnd4(
        col("n_transitions").cast("double") /
          sum(col("n_transitions")).over(byState).cast("double")))
      .orderBy(col("state"), col("next_state"))
  }

  /** TRUE STREAMING driver entry for [[attributionCredits]] — the
    * dual-list keyed state (pending purchases + lookback-pruned
    * touches) with the touch-TTL drain. Source seconds-truncated like
    * the batch twin so the `t_ts < p_ts` comparisons agree; the
    * per-purchase sink aggregates to the first/last-touch channel
    * counts the batch attribution oracle derives, hash-matched.
    */
  def runAttributionAvailableNow(s: org.apache.spark.sql.SparkSession,
                                 dir: String): DataFrame = {
    import s.implicits._
    val stage = stageWithSentinel(s, dir, (3600L + 2L) * 1000L)
    val src = s.readStream.schema(EventSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(stage)
      .select(col("event_id"), date_trunc("second", col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    val sink = s"stream_attr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      attributionCredits(src)
        .toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    val rows = s.table(sink).filter(col("user_id") >= 0)
    val firsts = rows.groupBy(col("first_channel").as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    val lasts = rows.groupBy(col("last_channel").as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    firsts.join(lasts, Seq("channel"), "full")
      .select(col("channel"),
        org.apache.spark.sql.functions.coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        org.apache.spark.sql.functions.coalesce(col("last_touch"), lit(0L)).as("last_touch"))
      .orderBy(col("channel"))
  }

  /** TRUE STREAMING driver entry for [[hoppingCounts]] — overlapping
    * (1 h, 15 min) windows through the streaming runtime, complete
    * mode like [[runHourlyAvailableNow]] (window×type cardinality is
    * bounded), hash-matched against the batch hopping oracle.
    */
  def runHoppingAvailableNow(s: org.apache.spark.sql.SparkSession,
                             dir: String): DataFrame = {
    val src = s.readStream.schema(EventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val sink = s"stream_hopping_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      hoppingCounts(src)
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    s.table(sink)
      .select(col("window_start"), col("event_type"), col("n_events"),
        round(col("total_value"), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** TRUE STREAMING driver entry for [[cmsState]] — the count-min
    * sketch AS bounded streaming aggregate state. The streamed sketch
    * is bit-for-bit the batch sketch on the same data (CMS updates
    * commute; parity spec), so reading the top-10 exact heavy
    * hitters' estimates out of it certifies the eps contract the same
    * way the batch q35 does — and the certification booleans are
    * pinned TRUE by the oracle, making the streamed sketch itself
    * driver-hash-checked.
    */
  def runCmsAvailableNow(s: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    val src = s.readStream.schema(EventSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("user_id"))
    val sink = s"stream_cms_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      cmsState(src, "user_id")
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Complete())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    val sketch = s.table(sink) // one row: (cms, n_total)
    val exact = graft.Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("user_id"))
      .limit(10)
    exact.crossJoin(org.apache.spark.sql.functions.broadcast(sketch))
      .select(col("user_id"), col("n_exact"),
        graft.functions.CmsEstimate(col("cms"), col("user_id")).as("est"),
        col("n_total"))
      .select(col("user_id"), col("n_exact"),
        (col("est") >= col("n_exact")).as("est_ge_exact"),
        (col("est") - col("n_exact") <=
          org.apache.spark.sql.functions.ceil(
            col("n_total").cast("double") * lit(0.001))).as("within_eps_n"))
      .orderBy(col("n_exact").desc, col("user_id"))
  }

  /** TRUE STREAMING driver entry for the STREAM-STREAM interval join
    * — two independent file sources over the same events log, each
    * watermarked, joined purchase-to-recent-click through the
    * symmetric join state store. Inner-join matches emit as both
    * sides arrive (the watermark bounds STATE, not emission), so a
    * bounded replay emits exactly the batch interval join — the
    * oracle is that join in SQL.
    */
  def runStreamJoinAvailableNow(s: org.apache.spark.sql.SparkSession,
                                dir: String): DataFrame = {
    def side(kind: String, idAs: String, tsAs: String) =
      s.readStream.schema(EventSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
        .filter(col("event_type") === kind)
        .select(col("event_id").as(idAs), col("user_id"), col("ts").as(tsAs))
        .withWatermark(tsAs, "1 hour")
    val p = side("purchase", "p_id", "p_ts")
    val c = side("click", "c_id", "c_ts")
    val joined = p.join(c,
      p("user_id") === c("user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
    val sink = s"stream_join_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      joined.select(col("p_id"), col("c_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    s.table(sink).orderBy(col("p_id"), col("c_id"))
  }

  /** TRUE STREAMING driver entry for [[dedupSpans]] — the NoTimeout
    * flatMapGroupsWithState first-occurrence filter over exploded
    * sentence spans of the documents stream. The single-file source
    * arrives in one micro-batch, so the per-group `minBy(doc_id,
    * pos)` is the global first occurrence and the kept set equals the
    * batch twin's exactly; the sink then joins batch per-doc sentence
    * counts to reproduce the full `txt_sentence_dedup` oracle shape
    * (n_sentences, n_kept, kept_fp) and hash-match it.
    */
  def runDedupSpansAvailableNow(s: org.apache.spark.sql.SparkSession,
                                dir: String): DataFrame = {
    import s.implicits._
    val docSchema = graft.Tables.documents(s, dir).schema
    def spansOf(df: DataFrame): DataFrame = df
      .select(col("doc_id"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.split(col("text"), "\\."))
          .as(Seq("pos", "raw")))
      .select(col("doc_id"), col("pos"),
        org.apache.spark.sql.functions.trim(col("raw")).as("sent"))
      .filter(col("sent") =!= "")
    val src = spansOf(
      s.readStream.schema(docSchema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(dir)).as[Span]
    val sink = s"stream_spans_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      dedupSpans(src)
        .toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    val kept = s.table(sink)
    val sents = spansOf(graft.Tables.documents(s, dir))
    val perDoc = sents.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sentences"))
    val keptAgg = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        org.apache.spark.sql.functions.md5(
          org.apache.spark.sql.functions.concat_ws(".",
            org.apache.spark.sql.functions.transform(
              org.apache.spark.sql.functions.array_sort(
                org.apache.spark.sql.functions.collect_list(
                  org.apache.spark.sql.functions.struct(col("pos"), col("sent")))),
              x => x.getField("sent")))).as("kept_fp"))
    perDoc.join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_sentences"),
        org.apache.spark.sql.functions.coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("kept_fp"))
      .orderBy(col("doc_id"))
  }

  final case class PendingEv(ts_s: Long, event_id: Long, state: String)
  final case class TransitionState(pending: List[PendingEv], frontier: Option[PendingEv])
  final case class Transition(user_id: Long, state: String, next_state: String)

  /** Streaming MARKOV TRANSITIONS — the continuous twin of
    * `graft.operators.Events.paths`: per-user consecutive-event pairs
    * in EVENT-TIME order, emitted only once the watermark seals their
    * order. Out-of-order arrivals buffer per user; an event is sealed
    * when its (second-floored) timestamp lies strictly below the
    * watermark's second — every admissible future event then sorts
    * strictly after it, so the emitted pair sequence is exactly the
    * batch `lead()` sequence over admitted events (parity
    * fuzz-checked). State per user = the unsealed buffer + one
    * frontier event (the last sealed one, needed to pair with the
    * next seal); event-time timeout drains buffers when the watermark
    * advances without new data for the user.
    *
    * State is BOUNDED by `frontierRetentionMs`: a user whose buffer
    * drained but whose frontier row lingered used to park that row
    * forever if the user never returned — unbounded state growth over
    * the stream's lifetime. The frontier now carries an event-time
    * TTL one retention horizon past its timestamp; expiry drops the
    * row, and a user returning after the horizon starts a fresh chain
    * (the cross-horizon pair is the retention tradeoff, same as the
    * compaction-truncates-time-travel one).
    */
  def transitions(events: Dataset[Event],
                  watermark: String = "1 hour",
                  frontierRetentionMs: Long = 7L * 86400 * 1000L): Dataset[Transition] = {
    import events.sparkSession.implicits._

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[TransitionState]): Iterator[Transition] = {
      val wm = state.getCurrentWatermarkMs()
      val wmSec = math.floorDiv(wm, 1000L) * 1000L
      val prior = state.getOption.getOrElse(TransitionState(Nil, None))
      val pending = prior.pending ++ batch.map(e =>
        PendingEv(math.floorDiv(e.ts.getTime, 1000L) * 1000L, e.event_id, e.event_type))
      val sorted = pending.sortBy(e => (e.ts_s, e.event_id))
      // sealed: no admissible future event (raw ts ≥ wm ⇒ ts_s ≥ wmSec)
      // can sort at-or-before it
      val (sealedEvs, open) = sorted.partition(_.ts_s < wmSec)
      val chain = prior.frontier.toList ++ sealedEvs
      val out = chain.sliding(2).collect {
        case Seq(a, b) => Transition(userId, a.state, b.state)
      }.toList
      val frontier = sealedEvs.lastOption.orElse(prior.frontier)
      if (open.isEmpty && frontier.isEmpty) state.remove()
      else if (open.isEmpty &&
               frontier.exists(f => wm >= f.ts_s + frontierRetentionMs)) {
        // frontier-only row past the retention horizon: the user never
        // returned — expire the state instead of keeping it forever
        state.remove()
      } else {
        state.update(TransitionState(open, frontier))
        if (open.nonEmpty)
          state.setTimeoutTimestamp(math.max(open.map(_.ts_s).min + 1000L, wm + 1L))
        else
          // frontier-only: schedule the TTL expiry (strictly above the
          // current watermark by the branch guard above)
          state.setTimeoutTimestamp(frontier.get.ts_s + frontierRetentionMs)
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  final case class Span(doc_id: Long, pos: Int, sent: String)
  final case class KeptSpan(doc_id: Long, pos: Int, sent: String)

  /** Streaming first-occurrence span filter — the continuous-ingest
    * twin of `graft.operators.TextAnalysis.sentenceDedup`: the first
    * span with a given text passes, every later duplicate is dropped.
    * State per distinct span is ONE boolean (seen), sharded by the
    * span text — the same hash-partition-by-span layout as the batch
    * operator's aggregate.
    *
    * Parity contract: WITHIN a micro-batch ties resolve by
    * (doc_id, pos) — identical to the batch twin — so a stream whose
    * batches arrive in doc_id order reproduces the batch keeper set
    * exactly (spec-asserted). Across out-of-order batches the
    * earliest ARRIVAL wins instead: with no event-time column there
    * is no watermark to re-order by, and "first seen wins" is the
    * standard semantics of continuous dedup (same divergence class
    * as any streaming `dropDuplicates`). State is unbounded by
    * design here (a dedup index never forgets); production bounds it
    * the way the batch pipeline does — periodic compaction against
    * the persisted pair/span index.
    */
  def dedupSpans(spans: Dataset[Span]): Dataset[KeptSpan] = {
    import spans.sparkSession.implicits._
    spans
      .groupByKey(_.sent)
      .flatMapGroupsWithState[Boolean, KeptSpan](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (sent: String, batch: Iterator[Span], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val first = batch.minBy(s => (s.doc_id, s.pos))
            Iterator(KeptSpan(first.doc_id, first.pos, sent))
          }
      }
  }

  final case class AnomalyFlag(event_type: String, hour: Timestamp, n_events: Long,
                               mu: Double, z: Double)

  /** Streaming twin of `graft.operators.Events.anomaly`: per event
    * type, hourly counts accumulate in state until the watermark
    * seals an hour; each sealed hour then scores against the trailing
    * `baseline` sealed hours (mean/σ from exact integer sums — the
    * SAME expression order as the batch twin, so flags agree
    * bit-for-bit on watermark-admitted data) and |z| ≥ threshold
    * emits a flag.
    *
    * Like the batch twin, the baseline window is over OBSERVED hours
    * (an hour with zero events occupies no slot). State per key is
    * O(pending hours + baseline) — bounded by the watermark delay and
    * the 24-hour window, never by history length.
    */
  def anomalies(events: Dataset[Event], zThreshold: Double = 2.0,
                baseline: Int = 24,
                watermark: String = "1 hour"): Dataset[AnomalyFlag] = {
    import events.sparkSession.implicits._
    val hourMs = 3600000L

    def update(eventType: String, batch: Iterator[Event],
               state: GroupState[AnomalyState]): Iterator[AnomalyFlag] = {
      val wm = state.getCurrentWatermarkMs()
      val prior = state.getOption.getOrElse(AnomalyState(Map.empty, Nil))
      // accumulate admitted events into their (pending) hours; events
      // in already-sealed hours are beyond the watermark contract
      val pending = batch.foldLeft(prior.pending) { (acc, e) =>
        val h = math.floorDiv(e.ts.getTime, hourMs) * hourMs
        acc.updated(h, acc.getOrElse(h, 0L) + 1L)
      }
      // hours whose end the watermark passed are sealed — score them
      // in ascending order against the trailing baseline
      val (closed, open) = pending.partition { case (h, _) => h + hourMs <= wm }
      var history = prior.history
      val flags = List.newBuilder[AnomalyFlag]
      closed.toList.sortBy(_._1).foreach { case (h, n) =>
        if (history.length == baseline) {
          val s1 = history.map(_.n).sum
          val s2 = history.map(hc => hc.n * hc.n).sum
          val nb = baseline.toDouble
          val mu = s1.toDouble / nb
          val variance = (s2.toDouble - s1.toDouble * s1.toDouble / nb) / (nb - 1.0)
          if (variance > 0) {
            val z = (n - mu) / math.sqrt(variance)
            if (math.abs(z) >= zThreshold)
              flags += AnomalyFlag(eventType, new Timestamp(h), n,
                math.floor(mu * 10000.0 + 0.5) / 10000.0,
                math.floor(z * 10000.0 + 0.5) / 10000.0)
          }
        }
        history = (history :+ HourCount(h, n)).takeRight(baseline)
      }
      if (open.isEmpty && history.isEmpty) state.remove()
      else {
        state.update(AnomalyState(open, history))
        if (open.nonEmpty)
          state.setTimeoutTimestamp(math.max(open.keys.min + hourMs, wm + 1L))
      }
      flags.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  final case class CusumState(pending: Map[Long, Long], p: Double, minP: Double)
  final case class CusumPoint(event_type: String, day: Timestamp, total: Double,
                              cusum: Double, alarm: Boolean)

  /** Streaming twin of `graft.operators.Events.cusum` with a FIXED
    * reference (μ, σ) — the canonical streaming CUSUM, where the
    * in-control mean comes from calibration, not from the stream
    * being monitored. The batch closed form S_t = P_t − min(0,
    * min_{j≤t} P_j is what makes this stream-able with O(1) sealed
    * state: the entire alarm history collapses to TWO doubles (the
    * running deviation sum and its running minimum) — no window, no
    * retained days. Per-key state is those two scalars plus the
    * pending (unsealed) day buckets the watermark still allows, so
    * state is bounded by the watermark delay, never history length.
    * Day totals accumulate in exact integer cents and convert with
    * the batch twin's op order, so sealed-day statistics agree
    * bit-for-bit with the batch recursion on watermark-admitted data.
    */
  def cusumAlarms(events: Dataset[Event], mu: Double, sigma: Double,
                  watermark: String = "1 day"): Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    val dayMs = 86400000L

    def update(eventType: String, batch: Iterator[Event],
               state: GroupState[CusumState]): Iterator[CusumPoint] = {
      val wm = state.getCurrentWatermarkMs()
      val prior = state.getOption.getOrElse(CusumState(Map.empty, 0.0, 0.0))
      val pending = batch.foldLeft(prior.pending) { (acc, e) =>
        val d = math.floorDiv(e.ts.getTime, dayMs) * dayMs
        // HALF_UP away from zero — the batch twin's Spark `round()`
        // semantics; `math.round` (half toward +inf) would disagree on
        // negative half-cent values (-0.005 → 0 vs the batch's -1)
        val c = e.value * 100.0
        val cents =
          if (c >= 0) math.floor(c + 0.5).toLong else math.ceil(c - 0.5).toLong
        acc.updated(d, acc.getOrElse(d, 0L) + cents)
      }
      val (closed, open) = pending.partition { case (d, _) => d + dayMs <= wm }
      var p = prior.p
      var minP = prior.minP
      val out = List.newBuilder[CusumPoint]
      closed.toList.sortBy(_._1).foreach { case (d, cents) =>
        p += cents.toDouble / 100.0 - mu - sigma / 2.0
        minP = math.min(minP, p) // min over prefixes INCLUDING the empty one (≤ 0)
        val s = math.floor((p - math.min(minP, 0.0)) * 10000.0 + 0.5) / 10000.0
        out += CusumPoint(eventType, new Timestamp(d), cents.toDouble / 100.0,
          s, s > 4.0 * sigma)
      }
      if (open.isEmpty && p == 0.0 && minP == 0.0) state.remove()
      else {
        state.update(CusumState(open, p, minP))
        if (open.nonEmpty)
          state.setTimeoutTimestamp(math.max(open.keys.min + dayMs, wm + 1L))
      }
      out.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** TRUE STREAMING driver entry #2: [[cdcSnapshot]] as an actual
    * `StreamingQuery` — this one exercises the STATEFUL runtime path
    * ([[org.apache.spark.sql.streaming.GroupState]] via
    * `mapGroupsWithState`, i.e. the state-store read/write/commit
    * cycle) that the windowed-aggregation `stream_hourly` entry does
    * not touch. Update-mode memory sink; the emitted snapshot is
    * shaped to the batch `ev_cdc_apply` oracle (tombstoned keys
    * dropped, same second-truncated timestamps, same argmax-by
    * (ts, event_id) state — commutative, so ANY arrival order
    * converges to the batch answer). One parquet file → one
    * micro-batch, but the final-state pick below (max n_ops per key,
    * n_ops strictly grows on re-emission) keeps the oracle exact even
    * if the source ever splits into several batches.
    */
  def runCdcAvailableNow(s: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    import s.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
    val src = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event]
    val sink = s"stream_cdc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = withStatePartitions(s, 4) {
      cdcSnapshot(src)
        .toDF()
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Update())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
    }
    q.awaitTermination()
    val wLast = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_ops").desc)
    s.table(sink)
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(wLast))
      .filter(col("_rn") === 1 && !col("tombstone"))
      .select(col("user_id"), col("last_event_id"), col("last_ts"),
        col("state"), col("value"), col("n_ops"), col("n_deletes"))
      .orderBy(col("user_id"))
  }

  final case class CdcState(tsS: Long, eventId: Long, op: String,
                            state: String, value: Double,
                            nOps: Long, nDeletes: Long)
  final case class CdcRow(user_id: Long, last_event_id: Long,
                          last_ts: Timestamp, state: String, value: Double,
                          n_ops: Long, n_deletes: Long, tombstone: Boolean)

  /** Streaming CDC MERGE-apply — the continuous twin of
    * `graft.operators.Events.cdcApply`: per-key state holds the
    * current snapshot row (the op that wins last-writer-wins on the
    * shared (second-truncated ts, event_id) total order) plus the
    * audit counters, re-emitted each micro-batch the key changes
    * (Update mode — a continuously-maintained materialized view).
    *
    * The state merge is an ARGMAX on a total order plus counter sums —
    * a commutative, associative fold — so NO watermark or ordering
    * guarantee is needed: any arrival order across any micro-batch
    * slicing converges to the batch twin's snapshot (the parity spec
    * feeds adversarial orderings). State is one row per live key,
    * independent of history length.
    */
  def cdcSnapshot(events: Dataset[Event]): Dataset[CdcRow] = {
    import events.sparkSession.implicits._
    def opOf(t: String): String =
      if (t == "error") "D" else if (t == "signup") "I" else "U"

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[CdcState]): CdcRow = {
      var cur = state.getOption.orNull
      batch.foreach { e =>
        val tsS = math.floorDiv(e.ts.getTime, 1000L) * 1000L
        val op = opOf(e.event_type)
        val del = if (op == "D") 1L else 0L
        cur =
          if (cur == null)
            CdcState(tsS, e.event_id, op, e.event_type, e.value, 1L, del)
          else if (tsS > cur.tsS || (tsS == cur.tsS && e.event_id > cur.eventId))
            CdcState(tsS, e.event_id, op, e.event_type, e.value,
              cur.nOps + 1L, cur.nDeletes + del)
          else cur.copy(nOps = cur.nOps + 1L, nDeletes = cur.nDeletes + del)
      }
      state.update(cur)
      CdcRow(userId, cur.eventId, new Timestamp(cur.tsS), cur.state,
        cur.value, cur.nOps, cur.nDeletes, cur.op == "D")
    }

    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }

  final case class Touch(ts_s: Long, event_id: Long, channel: String)
  final case class PendingPurchase(ts_s: Long, event_id: Long)
  final case class AttributionState(touches: List[Touch],
                                    purchases: List[PendingPurchase])
  final case class AttributionRow(user_id: Long, p_id: Long, p_ts: Timestamp,
                                  first_channel: String, last_channel: String,
                                  n_touches: Long)

  /** Streaming multi-touch ATTRIBUTION — the continuous twin of
    * `graft.operators.Events.attribution` at per-purchase granularity:
    * each purchase is credited its first/last click-or-view touchpoint
    * inside the lookback window, emitted exactly once, once the
    * watermark SEALS the purchase. The seal condition is the
    * [[transitions]] discipline: a purchase whose second-floored
    * timestamp lies strictly below the watermark's second can gain no
    * admissible influencing touch (every touch that counts has
    * t_ts < p_ts < wmSec, and admissible arrivals have ts ≥ wm), so
    * the credited first/last/n are final — byte-equal to the batch
    * twin's per-purchase answer over admitted events.
    *
    * State per user is BOUNDED by construction: touches prune to the
    * trailing lookback horizon behind the watermark (older touches
    * can influence no unsealed purchase, since unsealed means
    * p_ts ≥ wmSec), purchases leave state the moment they seal, and a
    * lookback-deep event-time TTL drains users who never return —
    * never a row parked forever (the [[transitions]]
    * frontier-retention lesson, applied from the start).
    */
  def attributionCredits(events: Dataset[Event],
                         lookbackSec: Long = 7L * 86400,
                         watermark: String = "1 hour"): Dataset[AttributionRow] = {
    import events.sparkSession.implicits._
    val lookbackMs = lookbackSec * 1000L

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[AttributionState]): Iterator[AttributionRow] = {
      val wm = state.getCurrentWatermarkMs()
      val wmSec = math.floorDiv(wm, 1000L) * 1000L
      val prior = state.getOption.getOrElse(AttributionState(Nil, Nil))
      var touches = prior.touches
      var purchases = prior.purchases
      batch.foreach { e =>
        val tsS = math.floorDiv(e.ts.getTime, 1000L) * 1000L
        e.event_type match {
          case "purchase" => purchases ::= PendingPurchase(tsS, e.event_id)
          case "click" | "view" => touches ::= Touch(tsS, e.event_id, e.event_type)
          case _ => ()
        }
      }
      val (ripe, open) = purchases.partition(_.ts_s < wmSec)
      val out = ripe.sortBy(p => (p.ts_s, p.event_id)).map { p =>
        val win = touches.filter(t =>
          t.ts_s < p.ts_s && t.ts_s >= p.ts_s - lookbackMs)
        if (win.isEmpty)
          AttributionRow(userId, p.event_id, new Timestamp(p.ts_s),
            "(none)", "(none)", 0L)
        else {
          val first = win.minBy(t => (t.ts_s, t.event_id))
          val last = win.maxBy(t => (t.ts_s, t.event_id))
          AttributionRow(userId, p.event_id, new Timestamp(p.ts_s),
            first.channel, last.channel, win.length.toLong)
        }
      }
      // touches older than one lookback behind the watermark second
      // can influence no unsealed purchase (those have p_ts ≥ wmSec)
      val kept = touches.filter(_.ts_s >= wmSec - lookbackMs)
      if (kept.isEmpty && open.isEmpty) state.remove()
      else {
        state.update(AttributionState(kept, open))
        val wake =
          if (open.nonEmpty) open.map(_.ts_s).min + 1000L
          // touch-only state: wake when the newest touch falls off the
          // lookback horizon, so a user who never returns still drains
          else kept.map(_.ts_s).max + lookbackMs + 1000L
        state.setTimeoutTimestamp(math.max(wake, wm + 1L))
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
