package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import EventStreams._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly windowed counts finalize after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = hourlyCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:20:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 10:40:00"), 1, "view", 3.0))
      q.processAllAvailable()
      // nothing finalized yet — watermark hasn't passed 11:00
      assert(spark.table("hourly_out").count() === 0)

      // an event far enough ahead pushes the watermark past 11:00
      input.addData(Event(4, ts("2024-01-01 12:30:00"), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_out")
        .orderBy("window_start", "event_type").collect()
      assert(rows.map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq === Seq(
        (ts("2024-01-01 10:00:00"), "click", 2L, 3.0),
        (ts("2024-01-01 10:00:00"), "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = hourlyCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(2, ts("2024-01-01 13:00:00"), 2, "click", 1.0)) // watermark → 12:50
      q.processAllAvailable()
      input.addData(Event(3, ts("2024-01-01 10:30:00"), 1, "click", 99.0)) // late, dropped
      q.processAllAvailable()
      val hour10 = spark.table("late_out")
        .filter($"window_start" === ts("2024-01-01 10:00:00")).collect()
      assert(hour10.length === 1)
      assert(hour10.head.getLong(2) === 1L) // late event not counted
    } finally q.stop()
  }

  test("sessionization closes sessions on gap and on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 1800, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10 min apart (one session), then 2h gap, then one more
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts("2024-01-01 12:30:00"), 1, "click", 5.0))
      q.processAllAvailable()
      // the in-batch gap close emits the first session
      val afterGap = spark.table("sessions_out").collect()
      assert(afterGap.length === 1)
      val s1 = afterGap.head
      assert(s1.getLong(0) === 1L)
      assert(s1.getTimestamp(1) === ts("2024-01-01 10:00:00"))
      assert(s1.getTimestamp(2) === ts("2024-01-01 10:10:00"))
      assert(s1.getLong(3) === 2L && s1.getDouble(4) === 3.0)

      // push watermark far ahead → open session times out and flushes
      input.addData(Event(99, ts("2024-01-01 23:00:00"), 2, "click", 0.5))
      q.processAllAvailable()
      input.addData(Event(100, ts("2024-01-02 12:00:00"), 3, "click", 0.5))
      q.processAllAvailable()
      val all = spark.table("sessions_out").orderBy("session_start").collect()
      assert(all.exists(r => r.getLong(0) === 1L &&
        r.getTimestamp(1) === ts("2024-01-01 12:30:00") && r.getLong(3) === 1L))
    } finally q.stop()
  }

  test("an event more than a gap before the open session becomes its own session") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 1800, watermark = "2 hours")
      .writeStream.format("memory").queryName("stray_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts("2024-01-01 10:30:00"), 9, "click", 1.0))
      q.processAllAvailable()
      // 09:30 is above the watermark (08:30) but a full hour before the
      // open session — the batch twin would split on that gap
      input.addData(Event(2, ts("2024-01-01 09:30:00"), 9, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts("2024-01-02 12:00:00"), 8, "click", 0.5)) // flush
      q.processAllAvailable()
      val s = spark.table("stray_sessions").filter($"user_id" === 9L)
        .orderBy("session_start").collect()
      assert(s.length === 2)
      assert(s(0).getTimestamp(1) === ts("2024-01-01 09:30:00") && s(0).getLong(3) === 1L)
      assert(s(1).getTimestamp(1) === ts("2024-01-01 10:30:00") && s(1).getLong(3) === 1L)
    } finally q.stop()
  }

  test("mutually-in-gap strays merge, and late in-gap arrivals extend a stray") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 1800, watermark = "2 hours")
      .writeStream.format("memory").queryName("stray_merge_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts("2024-01-01 12:00:00"), 5, "click", 1.0))
      q.processAllAvailable()
      // stray: above watermark (10:00) but >gap before the open session
      input.addData(Event(2, ts("2024-01-01 10:30:00"), 5, "view", 2.0))
      q.processAllAvailable()
      // later micro-batch, in-gap AFTER the stray: must extend the
      // stray's session, not start a third one (the round-2 code had
      // already emitted the stray closed at this point)
      input.addData(Event(3, ts("2024-01-01 10:45:00"), 5, "view", 4.0))
      q.processAllAvailable()
      input.addData(Event(9, ts("2024-01-02 12:00:00"), 6, "click", 0.5)) // flush
      q.processAllAvailable()
      val s = spark.table("stray_merge_sessions").filter($"user_id" === 5L)
        .orderBy("session_start").collect()
      assert(s.length === 2)
      assert(s(0).getTimestamp(1) === ts("2024-01-01 10:30:00"))
      assert(s(0).getTimestamp(2) === ts("2024-01-01 10:45:00"))
      assert(s(0).getLong(3) === 2L && s(0).getDouble(4) === 6.0)
      assert(s(1).getTimestamp(1) === ts("2024-01-01 12:00:00") && s(1).getLong(3) === 1L)
    } finally q.stop()
  }

  test("randomized batch-parity: streaming sessions equal the batch gap-split") {
    // Deterministic fuzz: random event times across random micro-batch
    // splits must produce EXACTLY the sessions of a batch gap-split,
    // because the 24h watermark admits every in-trial event. This is
    // the contract the pending-session state claims; the hand-written
    // cases above are its corners.
    val rnd = new scala.util.Random(20260812L)
    val gapMs = 1800L * 1000L
    val base = ts("2024-01-01 00:00:00").getTime
    for (trial <- 1 to 4) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val q = sessionize(input.toDS(), gapSeconds = 1800, watermark = "24 hours")
        .writeStream.format("memory").queryName(s"fuzz_sessions_$trial")
        .outputMode(OutputMode.Append()).start()
      try {
        val events = for {
          u <- 1 to 2
          i <- 1 to (5 + rnd.nextInt(8))
        } yield Event(u * 100L + i, new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L),
          u.toLong, "e", rnd.nextInt(5).toDouble)
        val shuffled = rnd.shuffle(events.toList)
        val nBatches = 1 + rnd.nextInt(4)
        shuffled.grouped(math.max(1, (shuffled.size + nBatches - 1) / nBatches))
          .foreach { b => input.addData(b: _*); q.processAllAvailable() }
        // flush: a far-future sentinel user advances the watermark past
        // every trial session's end + gap
        input.addData(Event(9999L, new Timestamp(base + 40L * 86400 * 1000), 999L, "f", 0.0))
        q.processAllAvailable()
        val got = spark.table(s"fuzz_sessions_$trial")
          .filter($"user_id" =!= 999L).collect()
          .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
            r.getLong(3), r.getDouble(4))).toSet
        // independent batch twin: per user, sort, split where the gap
        // is exceeded
        val expected = events.groupBy(_.user_id).flatMap { case (u, evs) =>
          val sorted = evs.map(e => (e.ts.getTime, e.value)).sorted.toList
          val splits = sorted.tail.foldLeft(List(List(sorted.head))) {
            case (acc @ cur :: done, e) =>
              if (e._1 - cur.head._1 <= gapMs) (e :: cur) :: done
              else List(e) :: acc
          }
          splits.map { seg =>
            val times = seg.map(_._1)
            (u, times.min, times.max, seg.size.toLong, seg.map(_._2).sum)
          }
        }.toSet
        assert(got === expected, s"trial $trial diverged from the batch twin")
      } finally q.stop()
    }
  }

  test("out-of-order event within the gap extends an open session backwards") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(input.toDS(), gapSeconds = 1800, watermark = "30 minutes")
      .writeStream.format("memory").queryName("ooo_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Event(1, ts("2024-01-01 10:30:00"), 7, "click", 1.0))
      q.processAllAvailable()
      // arrives in a LATER micro-batch, above the watermark, earlier
      // than the open session's start — must extend it backwards
      input.addData(Event(2, ts("2024-01-01 10:15:00"), 7, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(3, ts("2024-01-01 23:00:00"), 8, "click", 0.5)) // flush via timeout
      q.processAllAvailable()
      val s = spark.table("ooo_sessions").filter($"user_id" === 7L).collect()
      assert(s.length === 1)
      assert(s.head.getTimestamp(1) === ts("2024-01-01 10:15:00"))
      assert(s.head.getTimestamp(2) === ts("2024-01-01 10:30:00"))
      assert(s.head.getLong(3) === 2L)
    } finally q.stop()
  }

  test("streaming cusum equals the batch closed form and alarms at the planted shift") {
    implicit val sqlCtx = spark.sqlContext
    // daily totals: 20 calm days around 100, then a +50 sustained shift
    val dailyVals = (0 until 20).map(d => 100.0 + (d % 5) - 2) ++
      (20 until 28).map(_ => 150.0)
    val mu = dailyVals.take(20).sum / 20.0
    val sigma = {
      val m2 = dailyVals.take(20).map(v => v * v).sum / 20.0
      math.sqrt(m2 - mu * mu)
    }
    def evAt(d: Int): Event = {
      val base = Timestamp.valueOf("2024-01-01 00:10:00").getTime
      Event(d.toLong, new Timestamp(base + d * 86400000L), 1L, "click", dailyVals(d))
    }
    val input = MemoryStream[Event]
    val q = EventStreams.cusumAlarms(input.toDS(), mu, sigma, watermark = "1 hour")
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode(OutputMode.Append()).start()
    try {
      dailyVals.indices.foreach { d => input.addData(evAt(d)); q.processAllAvailable() }
      // push the watermark far past day 27 (bucket stays unsealed)
      input.addData(Event(999L, new Timestamp(
        Timestamp.valueOf("2024-01-01 00:10:00").getTime + 40L * 86400000L), 1L, "click", 0.0))
      q.processAllAvailable()
      val got = spark.table("cusum_out")
        .select("day", "total", "cusum", "alarm").collect()
        .map(r => (math.floorDiv(r.getTimestamp(0).getTime, 86400000L),
          r.getDouble(1), r.getDouble(2), r.getBoolean(3))).sortBy(_._1)
      // batch recursion with the same fixed reference
      var s = 0.0
      val expected = dailyVals.zipWithIndex.map { case (v, d) =>
        s = math.max(0.0, s + (v - mu - sigma / 2.0))
        val r4 = math.floor(s * 10000.0 + 0.5) / 10000.0
        (math.floorDiv(Timestamp.valueOf("2024-01-01 00:10:00").getTime, 86400000L) + d,
          v, r4, r4 > 4.0 * sigma)
      }
      assert(got.length === expected.length)
      got.zip(expected).foreach { case (g, e) =>
        assert(g._1 === e._1)
        assert(math.abs(g._2 - e._2) < 1e-9)
        assert(math.abs(g._3 - e._3) < 2e-4, s"day ${g._1}: ${g._3} vs ${e._3}")
        assert(g._4 === e._4)
      }
      // the shift is caught, and not before it happens
      assert(expected.count(_._4) > 0)
      val firstAlarm = got.find(_._4).get._1 - got.head._1
      assert(firstAlarm >= 20, s"alarm at day offset $firstAlarm")
    } finally q.stop()
  }

  test("streaming anomaly flags match the batch twin's formula on sealed hours") {
    implicit val sqlCtx = spark.sqlContext
    // 30 hours of a deterministic series: counts cycle 1..4 per hour,
    // with a 25-count spike in hour 27 — exactly one anomaly once
    // 24 baseline hours precede it
    val counts = (0 until 30).map(h => if (h == 27) 25 else 1 + (h % 4))
    // build per-hour batches across two days
    def evAt(h: Int, i: Int): Event = {
      val base = Timestamp.valueOf("2024-01-01 00:10:00").getTime
      Event(h * 1000 + i, new Timestamp(base + h * 3600000L), i.toLong, "click", 1.0)
    }
    val input = MemoryStream[Event]
    val q = EventStreams.anomalies(input.toDS(), zThreshold = 2.0, baseline = 24,
      watermark = "30 minutes")
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode(OutputMode.Append()).start()
    try {
      (0 until 30).foreach { h =>
        input.addData((0 until counts(h)).map(i => evAt(h, i)))
        q.processAllAvailable()
      }
      // push the watermark far past hour 29 so everything seals
      input.addData(evAt(40, 0))
      q.processAllAvailable()
      val flags = spark.table("anomaly_out")
        .select("event_type", "hour", "n_events", "mu", "z").collect()
      // recompute expected flags with the batch twin's exact formula
      val expected = (24 until 30).flatMap { h =>
        val hist = (h - 24 until h).map(counts(_).toLong)
        val s1 = hist.sum; val s2 = hist.map(x => x * x).sum
        val mu = s1.toDouble / 24.0
        val variance = (s2.toDouble - s1.toDouble * s1.toDouble / 24.0) / 23.0
        val z = (counts(h) - mu) / math.sqrt(variance)
        if (math.abs(z) >= 2.0) Some((h, counts(h).toLong,
          math.floor(mu * 10000.0 + 0.5) / 10000.0,
          math.floor(z * 10000.0 + 0.5) / 10000.0))
        else None
      }
      assert(expected.nonEmpty && expected.exists(_._1 == 27))
      val got = flags.map { r =>
        val h = ((r.getTimestamp(1).getTime -
          Timestamp.valueOf("2024-01-01 00:00:00").getTime) / 3600000L).toInt
        (h, r.getLong(2), r.getDouble(3), r.getDouble(4))
      }.toSet
      assert(got === expected.toSet)
    } finally q.stop()
  }

  test("randomized batch-parity: streamed transitions equal the batch lead() pairs") {
    val rnd = new scala.util.Random(20260813L)
    val base = ts("2024-01-01 00:00:00").getTime
    val types = Array("click", "view", "purchase")
    for (trial <- 1 to 4) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val q = transitions(input.toDS(), watermark = "24 hours")
        .writeStream.format("memory").queryName(s"fuzz_paths_$trial")
        .outputMode(OutputMode.Append()).start()
      try {
        val events = for {
          u <- 1 to 2
          i <- 1 to (6 + rnd.nextInt(8))
        } yield Event(u * 100L + i, new Timestamp(base + rnd.nextInt(6 * 3600) * 1000L),
          u.toLong, types(rnd.nextInt(3)), 0.0)
        val shuffled = rnd.shuffle(events.toList)
        val nBatches = 1 + rnd.nextInt(4)
        shuffled.grouped(math.max(1, (shuffled.size + nBatches - 1) / nBatches))
          .foreach { b => input.addData(b: _*); q.processAllAvailable() }
        // sentinel advances the watermark past every trial event
        input.addData(Event(9999L, new Timestamp(base + 40L * 86400 * 1000), 999L, "f", 0.0))
        q.processAllAvailable()
        val got = spark.table(s"fuzz_paths_$trial")
          .filter($"user_id" =!= 999L).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
          .groupBy(identity).view.mapValues(_.length).toMap
        // batch twin: per user, sort by (ts, event_id), consecutive pairs
        val expected = events.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
          val sorted = evs.sortBy(e => (e.ts.getTime, e.event_id)).toList
          sorted.zip(sorted.tail).map { case (a, b) => (u, a.event_type, b.event_type) }
        }.groupBy(identity).view.mapValues(_.length).toMap
        assert(got === expected, s"trial $trial transition multiset diverged")
      } finally q.stop()
    }
  }

  test("transitions: frontier-only state expires at the retention horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // tight 2h retention so the horizon is crossable in-test
    val q = transitions(input.toDS(), watermark = "1 hour",
        frontierRetentionMs = 2L * 3600 * 1000)
      .writeStream.format("memory").queryName("ttl_paths")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 8 under the horizon: the pair must still emit
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:00:00"), 8, "click", 1.0),
        Event(3, ts("2024-01-01 10:10:00"), 8, "view", 1.0))
      q.processAllAvailable()
      // wm -> 11:30: seals the events; user 7 becomes frontier-only
      // (horizon 12:00 still ahead, TTL registered)
      input.addData(Event(4, ts("2024-01-01 12:30:00"), 999, "f", 0.0))
      q.processAllAvailable()
      // wm -> 13:00: user 7's TTL fires, state dropped
      input.addData(Event(5, ts("2024-01-01 14:00:00"), 999, "f", 0.0))
      q.processAllAvailable()
      // user 7 returns AFTER the horizon: fresh chain, no cross-horizon pair
      input.addData(Event(6, ts("2024-01-01 13:30:00"), 7, "view", 1.0))
      q.processAllAvailable()
      input.addData(Event(7, ts("2024-01-03 00:00:00"), 999, "f", 0.0)) // flush
      q.processAllAvailable()
      val got = spark.table("ttl_paths").filter($"user_id" =!= 999L).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(got === Set((8L, "click", "view")),
        s"expected only user 8's pair (user 7's frontier must have expired): $got")
    } finally q.stop()
  }

  test("hopping windows finalize with the batch twin's memberships and counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = hoppingCounts(input.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hopping_out")
      .outputMode(OutputMode.Append()).start()
    try {
      val data = Seq(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:20:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 10:40:00"), 1, "view", 3.0))
      input.addData(data)
      input.addData(Event(4, ts("2024-01-01 14:00:00"), 3, "click", 4.0)) // seal hour-10 windows
      q.processAllAvailable()
      val streamed = spark.table("hopping_out")
        .filter($"window_start" < ts("2024-01-01 11:00:00"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val batch = data.toDF()
        .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour", "15 minutes"), $"event_type")
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum($"value").as("v"))
        .select($"window.start", $"event_type", $"n", $"v")
        .filter($"start" < ts("2024-01-01 11:00:00"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      // every event sits in exactly 4 overlapping windows
      assert(batch.toSeq.map(_._3).sum === 4L * data.length)
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streamed count-min sketch is bit-for-bit the batch sketch (mergeable state)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = cmsState(input.toDF(), "user_id", eps = 0.01)
      .writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      val data = (0 until 500).map { i =>
        Event(i.toLong, ts("2024-01-01 10:00:00"), (i % 37).toLong, "click", 1.0)
      }
      // arrival order differs from batch scan order: stream in 3
      // shuffled slices — commutativity must make the state identical
      val shuffled = new scala.util.Random(7).shuffle(data)
      shuffled.grouped(200).foreach { slice =>
        input.addData(slice); q.processAllAvailable()
      }
      val streamedCms = spark.table("cms_out").collect().head.getAs[Array[Byte]]("cms")
      val batchRow = cmsState(data.toDF(), "user_id", eps = 0.01).collect().head
      val batchCms = batchRow.getAs[Array[Byte]]("cms")
      assert(java.util.Arrays.equals(streamedCms, batchCms),
        "streamed sketch diverged from the batch sketch on identical admitted data")
      // and the estimate read path agrees with exact counts (eps-bounded)
      val est = data.toDF().select($"user_id").distinct()
        .crossJoin(spark.table("cms_out"))
        .select($"user_id",
          graft.functions.CmsEstimate($"cms", $"user_id").as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exact = data.groupBy(_.user_id).view.mapValues(_.size.toLong).toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n && est(k) <= n + math.ceil(0.01 * data.length).toLong,
          s"estimate for $k out of CMS bounds: ${est(k)} vs $n")
      }
    } finally q.stop()
  }

  test("streaming CDC snapshot converges to the batch twin under adversarial arrival order") {
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val all = graft.Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => Event(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    // deterministic adversarial shuffle, sliced into 7 micro-batches
    val shuffled = all.sortBy(e => (e.event_id * 2654435761L) % 1000003L)
    val input = MemoryStream[Event]
    val q = cdcSnapshot(input.toDS())
      .writeStream.format("memory").queryName("cdc_snapshot")
      .outputMode(OutputMode.Update()).start()
    try {
      shuffled.grouped(math.max(1, shuffled.length / 7 + 1)).foreach { b =>
        input.addData(b.toSeq); q.processAllAvailable()
      }
      // the final snapshot per key = the Update row with the largest
      // n_ops (counters strictly increase every batch the key sees)
      val finalRows = spark.table("cdc_snapshot").collect()
        .groupBy(_.getLong(0)).map { case (_, rows) => rows.maxBy(_.getLong(5)) }
      val got = finalRows.filterNot(_.getBoolean(7))
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getString(3), r.getDouble(4), r.getLong(5), r.getLong(6)))
        .toSet
      val want = graft.operators.Events.cdcApply(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2),
          r.getString(3), r.getDouble(4), r.getLong(5), r.getLong(6)))
        .toSet
      assert(got === want)
      assert(want.nonEmpty)
    } finally q.stop()
  }

  test("attribution: purchases seal once, credit first/last touch, late touch within watermark counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = attributionCredits(input.toDS(), lookbackSec = 3600, watermark = "2 hours")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
        Event(2, ts("2024-01-01 10:30:00"), 1, "click", 0.0),
        Event(3, ts("2024-01-01 10:45:00"), 1, "purchase", 9.0))
      q.processAllAvailable()
      assert(spark.table("attr_out").count() === 0, "purchase not sealed yet")
      // out-of-order touch BETWEEN the earlier touches, still admissible
      input.addData(Event(4, ts("2024-01-01 10:10:00"), 1, "view", 0.0))
      q.processAllAvailable()
      // watermark pushes past the purchase → exactly one sealed row
      input.addData(Event(9, ts("2024-01-01 14:00:00"), 2, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
      assert(rows.length === 1)
      val r = rows.head
      assert(r.getLong(1) === 3L && r.getString(3) === "view" &&
        r.getString(4) === "click" && r.getLong(5) === 3L,
        s"late in-watermark touch must be credited: $r")
      // seal user 2's no-touch purchase → (none) row, emitted once
      input.addData(Event(10, ts("2024-01-02 00:00:00"), 3, "view", 0.0))
      q.processAllAvailable()
      val u2 = spark.table("attr_out").filter($"user_id" === 2L).collect()
      assert(u2.length === 1)
      assert(u2.head.getString(3) === "(none)" && u2.head.getLong(5) === 0L)
    } finally q.stop()
  }

  test("randomized batch-parity: streaming attribution equals the batch windowed join") {
    val rnd = new scala.util.Random(20260813L)
    val lookbackMs = 3600L * 1000L
    val base = ts("2024-01-01 00:00:00").getTime
    for (trial <- 1 to 3) {
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[Event]
      val q = attributionCredits(input.toDS(), lookbackSec = 3600, watermark = "24 hours")
        .writeStream.format("memory").queryName(s"fuzz_attr_$trial")
        .outputMode(OutputMode.Append()).start()
      try {
        val types = Array("click", "view", "purchase")
        val events = for {
          u <- 1 to 3
          i <- 1 to (6 + rnd.nextInt(8))
        } yield Event(u * 100L + i, new Timestamp(base + rnd.nextInt(4 * 3600) * 1000L),
          u.toLong, types(rnd.nextInt(3)), 0.0)
        val shuffled = rnd.shuffle(events.toList)
        val nBatches = 1 + rnd.nextInt(4)
        shuffled.grouped(math.max(1, (shuffled.size + nBatches - 1) / nBatches))
          .foreach { b => input.addData(b: _*); q.processAllAvailable() }
        input.addData(Event(9999L, new Timestamp(base + 40L * 86400 * 1000), 999L, "view", 0.0))
        q.processAllAvailable()
        val got = spark.table(s"fuzz_attr_$trial")
          .filter($"user_id" =!= 999L).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(3), r.getString(4), r.getLong(5)))
          .toSet
        // independent batch reference: per purchase, touches in window
        val expected = events.filter(_.event_type == "purchase").map { p =>
          val win = events.filter(t => t.user_id == p.user_id &&
            (t.event_type == "click" || t.event_type == "view") &&
            t.ts.getTime < p.ts.getTime && t.ts.getTime >= p.ts.getTime - lookbackMs)
          if (win.isEmpty) (p.user_id, p.event_id, "(none)", "(none)", 0L)
          else {
            val first = win.minBy(t => (t.ts.getTime, t.event_id))
            val last = win.maxBy(t => (t.ts.getTime, t.event_id))
            (p.user_id, p.event_id, first.event_type, last.event_type, win.size.toLong)
          }
        }.toSet
        assert(got === expected, s"trial $trial")
      } finally q.stop()
    }
  }

  test("streamed forecast equals the batch Holt-Winters row-for-row") {
    // stream_forecast shares ev_forecast's DuckDB oracle VERBATIM —
    // this spec pins the precondition on the live engine: the
    // streaming 1-day tumbling agg (UTC windows) produces exactly
    // the batch daily buckets, so the shared smoothing core emits
    // identical fit, forecast, and conformal-band rows.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val streamed = graft.streaming.EventStreams
      .runForecastAvailableNow(spark, dir).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Events
      .holtWinters(spark, dir).collect().map(_.toSeq).toSeq
    assert(streamed === batch,
      "streamed forecast diverged from the batch twin")
  }

  test("streamed changepoints equal the batch segmentation row-for-row") {
    // stream_changepoints shares ev_changepoints' DuckDB oracle
    // VERBATIM — same precondition as the forecast twin: the
    // streaming 1-day tumbling agg produces exactly the batch daily
    // buckets, so the shared exact-integer segmentation core emits
    // identical segment rows.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val streamed = graft.streaming.EventStreams
      .runChangepointsAvailableNow(spark, dir).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Events
      .changepoints(spark, dir).collect().map(_.toSeq).toSeq
    assert(streamed === batch,
      "streamed changepoints diverged from the batch twin")
  }

  test("streamed acf equals the batch correlogram row-for-row") {
    // stream_acf shares ev_acf's DuckDB oracle VERBATIM — the first
    // streamed twin with a PER-KEY streaming aggregate, so this spec
    // additionally covers keyed Complete-mode state feeding the core.
    val dir = "/root/testdata/sf0.001"
    assume(new java.io.File(dir).isDirectory)
    val streamed = graft.streaming.EventStreams
      .runAcfAvailableNow(spark, dir).collect().map(_.toSeq).toSeq
    val batch = graft.operators.Events
      .acf(spark, dir).collect().map(_.toSeq).toSeq
    assert(streamed === batch, "streamed acf diverged from the batch twin")
  }
}
