package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants for the event-stream operators whose full
  * values the DuckDB oracle already hash-checks (ev_scd2,
  * ev_anomaly) — these specs pin the semantic properties a
  * hash-match alone doesn't explain.
  */
class EventsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("scd2 versions tile each user's timeline with no gaps or overlaps") {
    val out = Events.scd2(spark, sfDir)
      .select("user_id", "version", "state", "valid_from", "valid_to", "is_current")
      .collect()
      .groupBy(_.getLong(0))
    assert(out.nonEmpty)
    out.foreach { case (user, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      // versions are 1..n dense
      assert(sorted.map(_.getLong(1)).toSeq === (1L to sorted.length.toLong))
      // exactly one open (current) version, and it is the last
      assert(sorted.count(_.getBoolean(5)) === 1)
      assert(sorted.last.getBoolean(5), s"user $user: current version not last")
      // consecutive intervals abut exactly: valid_to(n) == valid_from(n+1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(4) === b.getTimestamp(3),
            s"user $user: gap/overlap between v${a.getLong(1)} and v${b.getLong(1)}")
          // a version only exists when the state actually changed
          assert(a.getString(2) !== b.getString(2),
            s"user $user: consecutive versions share state ${a.getString(2)}")
        case _ => ()
      }
    }
  }

  test("scd2 current states equal each user's last event state") {
    val lastEvents = graft.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_s"), col("event_type"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("ts_s").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Events.scd2(spark, sfDir).filter(col("is_current"))
      .select(col("user_id"), col("state")).collect()
      .foreach(r => assert(lastEvents(r.getLong(0)) === r.getString(1)))
  }

  test("anomaly only flags hours with a full 24h baseline and |z| at threshold") {
    val out = Events.anomaly(spark, sfDir, zThreshold = 2.0).collect()
    assert(out.nonEmpty)
    // every flagged hour indeed deviates: |n - mu| >= ~2 sigma implies
    // |z| >= 2 up to the 1e-4 output rounding
    out.foreach(r => assert(math.abs(r.getDouble(4)) >= 1.9999))
    // the first 24 hours of each series can never have a full
    // baseline, so no flags there
    val firstHours = graft.Tables.events(spark, sfDir)
      .groupBy(col("event_type")).agg(min(date_trunc("hour", col("ts"))).as("h0"))
      .collect().map(r => r.getString(0) -> r.getTimestamp(1)).toMap
    out.foreach { r =>
      val gapHours = (r.getTimestamp(1).getTime -
        firstHours(r.getString(0)).getTime) / 3600000L
      assert(gapHours >= 24, s"flag inside warmup window: $r")
    }
  }

  test("anomaly threshold monotonicity: a higher bar flags a subset") {
    val at2 = Events.anomaly(spark, sfDir, 2.0)
      .select("event_type", "hour").collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    val at3 = Events.anomaly(spark, sfDir, 3.0)
      .select("event_type", "hour").collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(at3.subsetOf(at2))
    assert(at3.size < at2.size)
  }

  test("paths transition mass: total transitions = events - users, rows per state sum to ~1") {
    val events = graft.Tables.events(spark, sfDir)
    val nEvents = events.count()
    val nUsers = events.select("user_id").distinct().count()
    val out = Events.paths(spark, sfDir).collect()
    assert(out.map(_.getLong(2)).sum === nEvents - nUsers,
      "every event except each user's last must emit exactly one transition")
    out.groupBy(_.getString(0)).foreach { case (state, rows) =>
      val pSum = rows.map(_.getDouble(4)).sum
      // each p is rounded to 4dp, so the sum drifts at most 5e-5 per row
      assert(math.abs(pSum - 1.0) <= 5e-5 * rows.length + 1e-9,
        s"state $state: probabilities sum to $pSum")
      assert(rows.forall(_.getLong(2) > 0))
    }
  }
}
