package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-stream analytics in batch form (SURVEY.md §7.1 item 8) so
  * every query is DuckDB-oracle-checkable; the true Structured
  * Streaming variants live in graft.streaming and are covered by
  * ScalaTest (a streaming sink can't be hash-compared by the driver).
  *
  * Timestamp discipline: the events table carries nanosecond
  * timestamps; Spark truncates to microseconds on read while DuckDB
  * keeps nanos. Every output (and every value that feeds ordering or
  * arithmetic that must match the oracle) is therefore truncated to
  * whole seconds on BOTH engines first.
  */
object Events {

  /** Tumbling 1-hour window aggregate — batch analogue of
    * `groupBy(window($"ts", "1 hour"))`: map-side-combinable hash
    * agg on (hour, type); one shuffle, ~3.6k groups/month — trivial
    * at any scale.
    */
  def hourly(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("hour"), col("event_type"))

  /** Gap-based sessionization (30 min): lag → session-break flag →
    * running sum = session id → per-session aggregate. Two window
    * passes + one agg, all partitioned by user_id — a single shuffle
    * key reused across stages, no self-join.
    */
  def sessions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val runningBreaks = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_s"))
      .withColumn("prev_ts", lag(col("ts_s"), 1).over(byUser))
      .withColumn("new_session",
        when(col("ts_s").cast("long") - col("prev_ts").cast("long") <= 1800, 0).otherwise(1))
      .withColumn("session_seq", sum(col("new_session")).over(runningBreaks))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_s")).as("session_start"),
        max(col("ts_s")).as("session_end"),
        (max(col("ts_s")).cast("long") - min(col("ts_s")).cast("long")).as("duration_sec"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** A/B experiment readout with CUPED variance reduction — the
    * production experimentation stack's core statistical move
    * (Deng et al. 2013): users hash-deterministically into two
    * variants, their PRE-period activity becomes the covariate, and
    * the post-period metric is adjusted by θ·(x − x̄) with
    * θ = cov(x,y)/var(x). The adjustment removes the between-user
    * variance the pre-period already explains, shrinking confidence
    * intervals at identical sample size — the Welch t on both the
    * naive and the CUPED metric is emitted so the gain is visible
    * in-row (`var_reduction_pct`). EVERYTHING derives from ONE
    * aggregation pass of exact integer-cent moment sums (Σx, Σy, Σx²,
    * Σy², Σxy per variant): θ, the adjusted means, and the adjusted
    * variances expand algebraically from those sums, so no second
    * scan and no float ever enters an ordering. Assignment is the
    * md5 discipline every sampling operator shares — stable under
    * reruns and ingest.
    */
  def cupedAb(s: SparkSession, dir: String, preDays: Int = 15): DataFrame =
    cupedAbOf(Tables.events(s, dir), preDays)

  /** The readout itself, over any (user_id, ts, value) relation. */
  def cupedAbOf(events: DataFrame, preDays: Int): DataFrame = {
    val ev = events
      .select(col("user_id"),
        floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"),
        round(col("value") * 100.0).cast("long").as("cents"))
    val loRow = ev.agg(min(col("day_d"))).head()
    if (loRow.isNullAt(0)) {
      // degenerate input: no events, no experiment — an empty readout
      // with the output schema beats an unboxing NPE on the null min
      val sp = events.sparkSession
      return sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "variant BIGINT, n_users BIGINT, mean_post DOUBLE, mean_cuped DOUBLE, " +
            "var_reduction_pct DOUBLE, t_naive DOUBLE, t_cuped DOUBLE"))
    }
    val lo = loRow.getLong(0)
    val split = lo + preDays
    val perUser = ev.groupBy(col("user_id"))
      .agg(sum(when(col("day_d") < split, col("cents")).otherwise(0L)).as("x"),
        sum(when(col("day_d") >= split, col("cents")).otherwise(0L)).as("y"))
      .withColumn("variant",
        (conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 2).cast("long"))
    val m = perUser.groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val all = Window.partitionBy()
    val d = (c: Column) => c.cast("double")
    // pooled θ and global x̄ from the two variant rows' exact sums
    // distinct names: Spark's case-insensitive resolver would make a
    // column literally named "SY" REPLACE the per-variant "sy"
    val g = m
      .withColumn("g_n", sum(col("n")).over(all))
      .withColumn("g_sx", sum(col("sx")).over(all))
      .withColumn("g_sy", sum(col("sy")).over(all))
      .withColumn("g_sxx", sum(col("sxx")).over(all))
      .withColumn("g_sxy", sum(col("sxy")).over(all))
      .withColumn("xbar", d(col("g_sx")) / d(col("g_n")))
      // zero pre-period variance (constant covariate) explains nothing
      // — θ pins to 0 so CUPED degrades to the naive readout instead
      // of a NaN poisoning every column (the madOutliers zero-MAD
      // guard, applied here)
      .withColumn("var_x_num",
        d(col("g_sxx")) - d(col("g_sx")) * d(col("g_sx")) / d(col("g_n")))
      .withColumn("theta",
        when(col("var_x_num") > 0.0,
          (d(col("g_sxy")) - d(col("g_sx")) * d(col("g_sy")) / d(col("g_n"))) /
            col("var_x_num"))
          .otherwise(lit(0.0)))
    // per-variant naive and CUPED moments, all algebraic in the sums;
    // cents → currency units at the very end
    val withStats = g
      .withColumn("mean_y", d(col("sy")) / d(col("n")))
      .withColumn("var_y",
        (d(col("syy")) - d(col("sy")) * d(col("sy")) / d(col("n"))) /
          (d(col("n")) - 1.0))
      // z = y − θ(x − x̄): Σz = Σy − θΣx + nθx̄;
      // Σz² = Σy² − 2θΣxy + θ²Σx² + 2θx̄Σy − 2θ²x̄Σx + nθ²x̄²
      .withColumn("sz",
        d(col("sy")) - col("theta") * d(col("sx")) +
          d(col("n")) * col("theta") * col("xbar"))
      .withColumn("szz",
        d(col("syy")) - lit(2.0) * col("theta") * d(col("sxy")) +
          col("theta") * col("theta") * d(col("sxx")) +
          lit(2.0) * col("theta") * col("xbar") * d(col("sy")) -
          lit(2.0) * col("theta") * col("theta") * col("xbar") * d(col("sx")) +
          d(col("n")) * col("theta") * col("theta") * col("xbar") * col("xbar"))
      .withColumn("mean_z", col("sz") / d(col("n")))
      .withColumn("var_z",
        (col("szz") - col("sz") * col("sz") / d(col("n"))) / (d(col("n")) - 1.0))
    // Welch t on both metrics needs the OTHER variant's row: the
    // two-row relation self-aggregates through the same tiny window
    val t = (mc: String, vc: String) => {
      val diff = col(mc) - (sum(col(mc)).over(all) - col(mc))
      val se = sqrt(col(vc) / d(col("n")) +
        (sum(col(vc) / d(col("n"))).over(all) - col(vc) / d(col("n"))))
      diff / se
    }
    withStats
      .withColumn("t_naive", t("mean_y", "var_y"))
      .withColumn("t_cuped", t("mean_z", "var_z"))
      .select(col("variant"), col("n").as("n_users"),
        graft.operators.CrossEngine.rnd4(col("mean_y") / lit(100.0)).as("mean_post"),
        graft.operators.CrossEngine.rnd4(col("mean_z") / lit(100.0)).as("mean_cuped"),
        graft.operators.CrossEngine.rnd4(
          (lit(1.0) - col("var_z") / col("var_y")) * lit(100.0))
          .as("var_reduction_pct"),
        graft.operators.CrossEngine.rnd4(col("t_naive")).as("t_naive"),
        graft.operators.CrossEngine.rnd4(col("t_cuped")).as("t_cuped"))
      .orderBy(col("variant"))
  }

  /** POISSON BOOTSTRAP confidence intervals for the per-type mean
    * value — resampling inference at data scale, the way production
    * experimentation platforms actually compute CIs: a classical
    * bootstrap draws n rows with replacement per replicate (impossible
    * to coordinate across a distributed scan), but the multinomial
    * resample is asymptotically a vector of independent Poisson(1)
    * weights — so each row derives, PER REPLICATE, a deterministic
    * Poisson(1) weight from an md5 hash (inverse CDF as integer
    * thresholds on the 32-bit hash — no float compare anywhere), and
    * replicate means are weighted aggregates. ONE corpus scan computes
    * all B replicates: the explode is map-side, the per-(type, b)
    * partial sums combine before the shuffle, and only |types|·B rows
    * ever move. CI bounds are nearest-rank percentiles of the B
    * integer replicate means (windows over B-row groups). The
    * hash-derived weights make the CI identical under rerun,
    * repartitioning and ingest order — an auditable interval, the
    * [[TextAnalysis.weightedSample]] determinism discipline.
    */
  def bootstrapCi(s: SparkSession, dir: String, reps: Int = 48): DataFrame =
    bootstrapCiOf(Tables.events(s, dir), reps)

  /** The bootstrap itself, over any (event_type, event_id, value)
    * relation. Cents are exact integers; every replicate mean is an
    * integer in micro-dollar units BEFORE any ordering (the
    * fix-before-sum rule), so the percentile cut is engine-exact.
    */
  def bootstrapCiOf(events: DataFrame, reps: Int): DataFrame = {
    // Poisson(1) inverse CDF as cumulative thresholds scaled to 2^32:
    // P(X<=k) for k=0..6; a hash above the last gets weight 7
    // (P ≈ 8.3e-8 — the tail's total mass, preserved not truncated).
    val thresholds = Seq(1580030168L, 3160060337L, 3950075421L,
      4213413783L, 4279248373L, 4292415291L, 4294609777L)
    val ev = events.select(col("event_type"), col("event_id"),
      round(col("value") * 100.0).cast("long").as("cents"))
    val u = conv(substring(md5((col("event_id") * lit(reps.toLong) + col("b"))
      .cast("string")), 1, 8), 16, 10).cast("long")
    val w = thresholds.zipWithIndex.foldRight(lit(7L): Column) {
      case ((t, k), acc) => when(col("u") < t, k.toLong).otherwise(acc)
    }
    val replicate = ev
      .select(col("event_type"), col("event_id"), col("cents"),
        explode(sequence(lit(0L), lit(reps - 1L))).as("b"))
      .withColumn("u", u)
      .select(col("event_type"), col("b"), w.as("w"), col("cents"))
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w")).as("sum_w"), sum(col("w") * col("cents")).as("sum_wx"))
      // FLOOR division (pmod keeps the remainder non-negative), not
      // Spark's truncate-toward-zero DIV: the DuckDB oracle's `//`
      // floors, and the two diverge on negative weighted sums —
      // latent with the all-positive testdata but wrong for the
      // public bootstrapCiOf API over arbitrary value columns
      .withColumn("mean_micro",
        when(col("sum_w") > 0,
          expr("(sum_wx * 10000L - pmod(sum_wx * 10000L, sum_w)) DIV sum_w"))
          .otherwise(0L))
    // nearest-rank percentile over the B integer replicate means:
    // lo = ceil(0.025·B)-th smallest, hi = ceil(0.975·B)-th
    val loIdx = math.ceil(0.025 * reps).toLong.max(1L)
    val hiIdx = math.ceil(0.975 * reps).toLong
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("mean_micro").asc, col("b").asc)
    val cis = replicate
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .groupBy(col("event_type"))
      .agg(
        min(when(col("rn") === loIdx, col("mean_micro"))).as("lo_micro"),
        min(when(col("rn") === hiIdx, col("mean_micro"))).as("hi_micro"))
    val point = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        expr("(sum(cents) * 10000L - pmod(sum(cents) * 10000L, count(1))) DIV count(1)")
          .as("point_micro"))
    point.join(cis, "event_type")
      .select(col("event_type"), col("n_events"),
        (col("point_micro").cast("double") / lit(1000000.0)).as("mean_value"),
        (col("lo_micro").cast("double") / lit(1000000.0)).as("ci_lo"),
        (col("hi_micro").cast("double") / lit(1000000.0)).as("ci_hi"),
        (col("lo_micro") <= col("point_micro") &&
          col("point_micro") <= col("hi_micro")).as("covers_point"))
      .orderBy(col("event_type"))
  }

  /** CUSUM changepoint detection per event type — the sequential
    * drift alarm (Page 1954) over daily totals: S_t = max(0, S_{t−1}
    * + (x_t − μ − k)) crosses h when the mean shifts by more than the
    * allowance k. The recursion LOOKS inherently sequential, but has
    * the closed form S_t = P_t − min_{j≤t} P_j with P the running sum
    * of deviations — so it is exactly TWO window passes (cumsum +
    * running min) over the bounded daily relation, no recursion, no
    * driver loop, and the corpus itself only ever feeds the one
    * map-side-combinable daily aggregation. μ, σ come from the
    * dailies' exact integer moment sums (values are 2-decimal cents),
    * k = σ/2 and h = 4σ the textbook defaults; the alarm flag is set
    * on the 1e-4-rounded statistic so threshold crossings are
    * engine-deterministic.
    */
  def cusum(s: SparkSession, dir: String): DataFrame =
    cusumOf(Tables.events(s, dir))

  /** The detector itself, over any (event_type, ts, value) relation. */
  def cusumOf(ev: DataFrame): DataFrame = {
    val daily = ev
      .select(col("event_type"),
        floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"),
        round(col("value") * 100.0).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day_d"))
      .agg(sum(col("cents")).as("tot"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("tot")).as("s"),
        sum(col("tot") * col("tot")).as("ss"))
      .select(col("event_type"), col("n_days"),
        (col("s").cast("double") / col("n_days").cast("double") / lit(100.0)).as("mu"),
        (sqrt((col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double")
            / col("n_days").cast("double")) / col("n_days").cast("double"))
          / lit(100.0)).as("sigma"))
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily.join(broadcast(stats), "event_type")
      .withColumn("dev",
        col("tot").cast("double") / lit(100.0) - col("mu") - col("sigma") / lit(2.0))
      .withColumn("p", sum(col("dev")).over(byDay))
      .withColumn("run_min", least(min(col("p")).over(byDay), lit(0.0)))
      .withColumn("cusum",
        graft.operators.CrossEngine.rnd4(col("p") - col("run_min")))
      .withColumn("alarm", col("cusum") > lit(4.0) * col("sigma"))
    scored.groupBy(col("event_type"))
      .agg(min(col("n_days")).as("n_days"),
        graft.operators.CrossEngine.rnd4(min(col("mu"))).as("mean_daily"),
        graft.operators.CrossEngine.rnd4(min(col("sigma"))).as("sigma_daily"),
        sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarm_days"),
        graft.operators.CrossEngine.rnd4(max(col("cusum"))).as("max_cusum"),
        min(when(col("alarm"), col("day_d"))).as("first_alarm_day"))
      .orderBy(col("event_type"))
  }

  /** Theil–Sen robust trend per event type — the median of all
    * pairwise slopes between daily totals, with the intercept as the
    * median residual at slope m̂: up to a ~29 % outlier fraction
    * cannot move the fitted line, where OLS (q42's estimator) chases
    * every spike. Scale discipline: the corpus aggregates to (type,
    * day) DAILY TOTALS first — a bounded relation (#types × #days)
    * regardless of event volume — and the O(days²) pairwise expansion
    * runs on that bounded frame, so the quadratic term is in DAYS,
    * never rows. Daily totals are exact integer cents (values are
    * 2-decimal), so every slope is the same double on both engines
    * and the medians sit on deterministic inputs.
    */
  def theilSen(s: SparkSession, dir: String): DataFrame =
    theilSenOf(Tables.events(s, dir))

  /** The estimator itself, over any (event_type, ts, value) relation. */
  def theilSenOf(ev: DataFrame): DataFrame = {
    val daily = ev
      .select(col("event_type"),
        floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"),
        // exact integer cents; the double source is 2-decimal
        round(col("value") * 100.0).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day_d"))
      .agg(sum(col("cents")).as("tot"))
    val a = daily.select(col("event_type"), col("day_d").as("xa"), col("tot").as("ya"))
    val b = daily.select(col("event_type"), col("day_d").as("xb"), col("tot").as("yb"))
    val slopes = a.join(b, Seq("event_type"))
      .filter(col("xa") < col("xb"))
      .select(col("event_type"), col("xa"), col("ya"),
        ((col("yb") - col("ya")).cast("double") /
          (col("xb") - col("xa")).cast("double") / lit(100.0)).as("slope"))
    val m = slopes.groupBy(col("event_type"))
      .agg(expr("percentile(slope, 0.5)").as("m_hat"),
        count(lit(1)).as("n_pairs"))
    daily.join(broadcast(m), "event_type")
      .select(col("event_type"), col("m_hat"), col("n_pairs"),
        (col("tot").cast("double") / lit(100.0) -
          col("m_hat") * col("day_d").cast("double")).as("resid"))
      .groupBy(col("event_type"))
      .agg(min(col("n_pairs")).as("n_pairs"),
        graft.operators.CrossEngine.rnd4(min(col("m_hat"))).as("slope_per_day"),
        graft.operators.CrossEngine.rnd4(expr("percentile(resid, 0.5)"))
          .as("intercept"))
      .orderBy(col("event_type"))
  }

  /** Robust outlier audit per event type — the median/MAD
    * (median-absolute-deviation) twin of [[anomaly]]'s mean/σ z-score:
    * the modified z `0.6745·(x − med)/MAD` with the standard 3.5 cut
    * (Iglewicz–Hoberg), immune to the very outliers it hunts, which
    * matters on heavy-tailed telemetry where a handful of extremes
    * inflate σ and mask each other. Two exact per-group percentile
    * aggregations (group count is the event-type vocabulary, so the
    * per-group state is bounded) and two BROADCAST joins of the tiny
    * stats relation back to the scan — the corpus shuffles only on
    * event_type, twice, nothing else. The modified z is rounded to
    * the 1e-4 grid BEFORE the 3.5 cut so the outlier membership is
    * engine-deterministic.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame =
    madOutliersOf(Tables.events(s, dir).select(col("event_type"), col("value")))

  /** The audit itself, over any (event_type, value) relation. */
  def madOutliersOf(ev: DataFrame): DataFrame = {
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("absdev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("percentile(absdev, 0.5)").as("mad"))
    // mad = 0 (a majority-constant group) must not reach the divide:
    // 0/0 → NaN, and NaN orders BELOW thresholds on Spark but ABOVE
    // them in the oracle engine — the guard pins z to 0 on both
    dev.join(broadcast(mad), "event_type")
      .withColumn("z", when(col("mad") > 0.0, graft.operators.CrossEngine.rnd4(
        lit(0.6745) * (col("value") - col("med")) / col("mad")))
        .otherwise(lit(0.0)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        graft.operators.CrossEngine.rnd4(min(col("med"))).as("median_value"),
        graft.operators.CrossEngine.rnd4(min(col("mad"))).as("mad_value"),
        sum(when(abs(col("z")) > 3.5, 1L).otherwise(0L)).as("n_outliers"),
        graft.operators.CrossEngine.rnd4(max(abs(col("z")))).as("max_abs_z"))
      .orderBy(col("event_type"))
  }

  /** Max-concurrent-sessions per hour — the interval-overlap /
    * capacity metric, computed as a TWO-LEVEL sweep line so the
    * classic single-threaded global cumsum never materializes:
    * sessions become ±1 boundary deltas, each HOUR does a
    * partition-local ordered prefix sum (bounded work, parallel
    * across hours), and only the per-hour NET deltas — one row per
    * hour, not per event — meet in the tiny global running sum that
    * anchors each hour's base occupancy. Max concurrency in an hour =
    * base + max in-hour prefix. At 100 TB the event-level work stays
    * embarrassingly parallel and the serial window touches only
    * #hours rows. Ends are swept at `end + 1 s` (sessions occupy
    * their inclusive last second); simultaneous boundaries order
    * starts before ends, the inclusive-overlap convention. Hours with
    * no boundary crossings carry no row (occupancy is constant and
    * equal to the previous hour's `open_at_end`).
    */
  def concurrency(s: SparkSession, dir: String): DataFrame =
    concurrencyOfSessions(sessions(s, dir))

  /** The sweep itself, over any (session_start, session_end) interval
    * relation. `max_concurrent` clamps the in-hour prefix at 0: an
    * hour whose only boundaries are ends peaks at its START-of-hour
    * occupancy (the base), not after its first departure.
    */
  def concurrencyOfSessions(sess: DataFrame): DataFrame = {
    val deltas = sess
      .select(explode(array(
        struct(col("session_start").as("t"), lit(1).as("delta")),
        struct((col("session_end") + expr("INTERVAL 1 SECOND")).as("t"),
          lit(-1).as("delta")))).as("d"))
      .select(col("d.t").as("t"), col("d.delta").as("delta"),
        date_trunc("hour", col("d.t")).as("hour"))
    val inHour = Window.partitionBy(col("hour"))
      .orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourAgg = deltas
      .withColumn("run_in_hour", sum(col("delta")).over(inHour))
      .groupBy(col("hour"))
      .agg(max(col("run_in_hour")).as("max_in_hour"),
        sum(col("delta")).as("net"),
        sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"))
    val priorHours = Window.orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hourAgg
      .withColumn("base", coalesce(sum(col("net")).over(priorHours), lit(0L)))
      .select(col("hour"), col("n_starts"),
        (col("base") + greatest(col("max_in_hour"), lit(0L))).as("max_concurrent"),
        (col("base") + col("net")).as("open_at_end"))
      .orderBy(col("hour"))
  }

  /** Semi-structured props: typed JSON extraction feeding a grouped
    * aggregate — the schema-on-read path for event payloads. Long
    * sums stay exact across engines.
    */
  def propsStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Ordered funnel: view → click → purchase, strictly increasing
    * second-truncated timestamps per user. Each stage is a per-user
    * min over the prior stage's anchor (aggregate → join → filter —
    * no window over raw events), so the whole funnel is three
    * shuffles on user_id regardless of event volume; the tiny stage
    * counts cross-join into one output relation. Strict `>` at
    * second granularity matches the oracle exactly (sub-second
    * precision differs between the engines).
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t1"))
    val clicks = e.filter(col("event_type") === "click")
      .join(views, "user_id").filter(col("ts_s") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t2"))
    val purchases = e.filter(col("event_type") === "purchase")
      .join(clicks, "user_id").filter(col("ts_s") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("t3"))
    views.agg(count(lit(1)).as("n_users")).withColumn("step", lit(1L))
      .withColumn("stage", lit("view"))
      .unionByName(clicks.agg(count(lit(1)).as("n_users"))
        .withColumn("step", lit(2L)).withColumn("stage", lit("click_after_view")))
      .unionByName(purchases.agg(count(lit(1)).as("n_users"))
        .withColumn("step", lit(3L)).withColumn("stage", lit("purchase_after_click")))
      .select(col("step"), col("stage"), col("n_users"))
      .orderBy(col("step"))
  }

  /** Time-BOUNDED funnel — the product-analytics semantics [[funnel]]
    * deliberately omits: each stage must convert within `windowSec`
    * of the PREVIOUS stage's anchor (view → click within the window →
    * purchase within the window of that click), and each surviving
    * stage reports its median time-to-convert. An unbounded funnel
    * counts a purchase months after the click as a conversion; the
    * windowed form is what attribution actually uses. Same staged
    * per-user min-anchor shape (aggregate → join → filter, three
    * shuffles on user_id, no window over raw events); the upper bound
    * is one more pushed predicate per stage. Epoch-second arithmetic
    * keeps the bound integer-exact across engines.
    */
  def funnelWindowed(s: SparkSession, dir: String,
                     windowSec: Long = 86400L): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).cast("long").as("sec"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("sec")).as("t1"))
    val clicks = e.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("sec") > col("t1") && col("sec") <= col("t1") + lit(windowSec))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t2"), min(col("t1")).as("t1"))
    val purchases = e.filter(col("event_type") === "purchase")
      .join(clicks.select(col("user_id"), col("t2")), "user_id")
      .filter(col("sec") > col("t2") && col("sec") <= col("t2") + lit(windowSec))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t3"), min(col("t2")).as("t2"))
    views.agg(count(lit(1)).as("n_users"),
        lit(null).cast("double").as("median_secs_to_stage"))
      .withColumn("step", lit(1L)).withColumn("stage", lit("view"))
      .unionByName(clicks
        .select((col("t2") - col("t1")).as("dt"))
        .agg(count(lit(1)).as("n_users"),
          graft.operators.CrossEngine.rnd4(expr("percentile(dt, 0.5)"))
            .as("median_secs_to_stage"))
        .withColumn("step", lit(2L)).withColumn("stage", lit("click_within_window")))
      .unionByName(purchases
        .select((col("t3") - col("t2")).as("dt"))
        .agg(count(lit(1)).as("n_users"),
          graft.operators.CrossEngine.rnd4(expr("percentile(dt, 0.5)"))
            .as("median_secs_to_stage"))
        .withColumn("step", lit(3L)).withColumn("stage", lit("purchase_within_window")))
      .select(col("step"), col("stage"), col("n_users"), col("median_secs_to_stage"))
      .orderBy(col("step"))
  }

  /** Schema-on-read into a MAP column: parse the JSON payload to
    * map<string,long>, explode the entries (one row per key), and
    * aggregate per key — the generic path when payload keys are NOT
    * known up front (vs [[propsStats]]'s fixed-path extraction).
    * Generate + partial agg in one stage, a single shuffle on key.
    */
  def propsMapStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, MapType, StringType}
    Tables.events(s, dir)
      .select(explode(from_json(col("props"), MapType(StringType, LongType))).as(Seq("key", "value")))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_entries"),
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("key"))
  }

  /** Weekly cohort retention: users grouped by the week of their
    * first event; each later active week counts into (cohort_week,
    * week_offset). Two hash aggregations and one join, all keyed by
    * user — the standard O(users) retention matrix at any event
    * volume. Both engines truncate weeks to Monday and the offsets
    * are exact multiples of 7 days, so the matrix hash-matches.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val weekly = Tables.events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohorts = weekly.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    weekly.join(cohorts, "user_id")
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Kaplan-Meier estimator over `lives` (user_id, dur, event):
    * S(t) = Π_{t_i ≤ t} (1 − d_i / n_i) with d_i the observed events
    * at duration t_i and n_i the users still at risk (observed
    * duration ≥ t_i, right-censored users included until they drop
    * out) — the standard survival curve behind retention, churn and
    * time-to-conversion readouts. One row per event time: (t_day,
    * n_risk, n_events, survival).
    *
    * Scale shape: the user table collapses to the DAY-GRANULAR
    * duration spine in one hash-agg (≤ observation-window days, not
    * data-sized), so the two cumulative windows (at-risk suffix sum,
    * log-survival prefix sum) run unpartitioned over a bounded
    * post-aggregation frame — listed in the Explain census.
    *
    * Determinism: each step's log-factor ln((n−d)/n) is floored to
    * integer micros before the cumulative sum (exact integer math on
    * both engines), with one exp at the end; a step where every
    * at-risk user churns (n = d) pins survival to exactly 0 from that
    * time on rather than taking log of 0.
    */
  def kaplanMeier(lives: DataFrame): DataFrame = {
    val byDur = lives.groupBy(col("dur")).agg(
      count(lit(1)).as("n_all"),
      sum(when(col("event"), 1L).otherwise(0L)).as("d"))
    val wRisk = Window.orderBy(col("dur").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCum = Window.orderBy(col("dur").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDur
      .withColumn("n_risk", sum(col("n_all")).over(wRisk))
      .filter(col("d") > 0)
      .withColumn("l_micro", when(col("n_risk") > col("d"),
        floor(log((col("n_risk") - col("d")).cast("double")
            / col("n_risk").cast("double")) * lit(1000000.0) + lit(0.5))
          .cast("long")))
      .withColumn("zeroed", max(when(col("l_micro").isNull, 1L).otherwise(0L)).over(wCum))
      .withColumn("cum_micro", sum(coalesce(col("l_micro"), lit(0L))).over(wCum))
      .select(col("dur").as("t_day"), col("n_risk"), col("d").as("n_events"),
        when(col("zeroed") === 1L, lit(0.0))
          .otherwise(graft.operators.CrossEngine.rnd4(
            exp(col("cum_micro").cast("double") / lit(1000000.0))))
          .as("survival"))
      .orderBy(col("t_day"))
  }

  /** Driver query: TIME-TO-CONVERSION survival — duration runs from
    * a user's first event to their first `purchase` (the observed
    * event); a user who never purchases is right-censored at the
    * corpus's observation end. Day granularity on DATE casts keeps
    * both engines' durations identical; the whole user table derives
    * from one hash-agg over events.
    */
  def survivalQuery(s: SparkSession, dir: String,
                    eventType: String = "purchase"): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("d"), col("event_type"))
    val obsEnd = broadcast(ev.agg(max(col("d")).as("obs_end")))
    val lives = ev.groupBy(col("user_id")).agg(
        min(col("d")).as("first_d"),
        min(when(col("event_type") === eventType, col("d"))).as("conv_d"))
      .crossJoin(obsEnd)
      .select(col("user_id"),
        when(col("conv_d").isNotNull, datediff(col("conv_d"), col("first_d")))
          .otherwise(datediff(col("obs_end"), col("first_d")))
          .cast("long").as("dur"),
        col("conv_d").isNotNull.as("event"))
    kaplanMeier(lives)
  }

  /** Backward as-of join: each purchase matched to the user's most
    * recent click at-or-before it. See [[AsOfJoin]] for the
    * single-shuffle plan.
    */
  def purchaseAsofClick(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    AsOfJoin.backward(purchases, clicks, Seq("user_id"), "ts", "click_ts",
        Seq("click_ts", "click_value"))
      .select(col("event_id"), col("user_id"),
        date_trunc("second", col("ts")).as("purchase_ts"),
        date_trunc("second", col("click_ts")).as("click_ts_s"),
        col("click_value"))
      .orderBy(col("event_id"))
  }

  /** Slowly-changing-dimension type 2 from a change log: each user's
    * event stream is read as attribute updates (state = event_type),
    * consecutive duplicates collapse, and each surviving change opens
    * a validity interval closed by the next change — the standard
    * CDC-to-warehouse merge every large pipeline runs. One shuffle
    * key (user_id) end to end: the change-detection lag, the
    * version-numbering row_number, and the interval-closing lead all
    * share the same window partitioning, so Spark plans a single
    * exchange feeding three window passes.
    *
    * Ties at second granularity break by event_id (both engines),
    * making the version history deterministic.
    */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_s"), col("event_type").as("state"))
      .withColumn("prev_state", lag(col("state"), 1).over(byUser))
      .filter(col("prev_state").isNull || col("state") =!= col("prev_state"))
      .withColumn("version", row_number().over(byUser).cast("long"))
      .withColumn("valid_to", lead(col("ts_s"), 1).over(byUser))
      .select(col("user_id"), col("version"), col("state"),
        col("ts_s").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** POINT-IN-TIME (temporal) join — enrich each purchase fact with
    * the SCD2 dimension version valid AT the fact's event time, the
    * correctness discipline that prevents feature leakage in training
    * pipelines (a fact must never see a dimension version from its
    * future). Implemented as the backward as-of join against the
    * version-START table ([[AsOfJoin.backward]]): one shuffle on
    * user_id, no interval range-join — attaching the latest version
    * with `valid_from <= ts` is exactly "the version whose validity
    * interval covers ts" because versions tile each user's timeline
    * (proven by the scd2 spec). The oracle cross-checks with the
    * explicit BETWEEN formulation.
    */
  def pitJoin(s: SparkSession, dir: String): DataFrame = {
    // zero-length versions (two changes in the same second) cover no
    // instant: the interval formulation can never match them, and
    // dropping them makes valid_from unique per user, so the as-of
    // tie-break is deterministic
    val dim = scd2(s, dir)
      .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
      .select(col("user_id"), col("version"), col("state"), col("valid_from"))
    val facts = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_s"),
        round(col("value"), 2).as("value"))
    AsOfJoin.backward(facts, dim, Seq("user_id"), "ts_s", "valid_from",
      Seq("version", "state"))
      .orderBy(col("user_id"), col("ts_s"), col("event_id"))
  }

  /** Rolling z-score anomaly detection on the hourly event-count
    * series, per event type: each hour scores against the mean/stddev
    * of the PRIOR 24 fully-observed hours (trailing frame excludes
    * the current row — an anomaly must not dilute its own baseline),
    * and |z| ≥ 2 flags it. Hash agg to hours first (map-side
    * combine), then one window pass over the tiny hourly series —
    * event volume only touches the first aggregation, so the operator
    * is one data-sized shuffle at any scale.
    */
  def anomaly(s: SparkSession, dir: String, zThreshold: Double = 2.0): DataFrame = {
    val series = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val trailing = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    // mean/variance are DERIVED from exact integer window sums (s1,
    // s2 ≤ 2⁵³ — no float drift), in a fixed expression order both
    // engines evaluate identically in IEEE doubles; a built-in
    // windowed stddev would leave the moment-accumulation order (and
    // its last-bit rounding) to each engine
    val mu = col("s1").cast("double") / lit(24.0)
    val variance = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / lit(24.0)) / lit(23.0)
    series
      .withColumn("s1", sum(col("n_events")).over(trailing))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(trailing))
      .withColumn("n_base", count(col("n_events")).over(trailing))
      // score only hours with a full baseline and nonzero spread
      .filter(col("n_base") === 24 && variance > 0)
      .withColumn("z", (col("n_events") - mu) / sqrt(variance))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("event_type"), col("hour"), col("n_events"),
        CrossEngine.rnd4(mu).as("mu"), CrossEngine.rnd4(col("z")).as("z"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** INCREMENTAL aggregate maintenance (the materialized-view /
    * incremental-view-maintenance discipline): daily aggregate state
    * is kept in ALGEBRAIC form — (n, sum, min, max) per (day, type) —
    * so merging a new delta is `unionByName` + the same hash
    * aggregate, touching only state + delta, never historical raw
    * events. Derived values (avg) compute at READ time from the
    * algebraic parts; storing them would make the state non-mergeable.
    * At 100 TB this is the difference between reprocessing a day and
    * reprocessing a history.
    */
  def dailyAggState(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Merge an existing state with a new delta's state: same-key rows
    * combine by the aggregates' own merge functions (count+count,
    * sum+sum, min(min), max(max)).
    */
  def mergeDailyAggs(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(col("day"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** Driver query: fold the event history through THREE chronological
    * delta merges (as an incremental pipeline would day by day) and
    * read out the final state with derived averages — the oracle is a
    * single-pass aggregate over everything, so the hash-match PROVES
    * the merge path is lossless.
    */
  def deltaAgg(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("ts"), col("event_type"), col("value"))
    val cut1 = to_timestamp(lit("2024-01-08 00:00:00"))
    val cut2 = to_timestamp(lit("2024-01-15 00:00:00"))
    val deltas = Seq(
      ev.filter(col("ts") < cut1),
      ev.filter(col("ts") >= cut1 && col("ts") < cut2),
      ev.filter(col("ts") >= cut2))
    val finalState = deltas.map(dailyAggState)
      .reduce((st, d) => mergeDailyAggs(st, d))
    finalState
      .select(col("day"), col("event_type"), col("n_events"),
        round(col("sum_value"), 2).as("sum_value"),
        col("min_value"), col("max_value"),
        round(col("sum_value") / col("n_events"), 4).as("avg_value"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Time-series RESAMPLE with gap-fill and forward-fill: per-user
    * 4-hour bins, a generated spine closing the gaps between each
    * user's first and last bin, and the last observed value carried
    * forward — the regularization step before feeding irregular event
    * streams into windowed models. The spine is a per-user generator
    * (each user's range explodes independently — no global calendar
    * relation), the fill is one `last(ignoreNulls)` running window on
    * the same user partitioning as the bin agg, so the whole operator
    * is one shuffle key end to end.
    */
  def resample(s: SparkSession, dir: String, binSeconds: Long = 14400L): DataFrame = {
    val binned = Tables.events(s, dir).filter(col("user_id") < 10)
      .select(col("user_id"),
        (floor(col("ts").cast("long") / binSeconds) * binSeconds).cast("long").as("bin_s"),
        col("value"))
      .groupBy(col("user_id"), col("bin_s"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("v_sum"))
    val spine = binned.groupBy(col("user_id"))
      .agg(min(col("bin_s")).as("lo"), max(col("bin_s")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), lit(binSeconds))).as("bin_s"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("bin_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(binned, Seq("user_id", "bin_s"), "left")
      .select(col("user_id"), col("bin_s"),
        coalesce(col("n_events"), lit(0L)).as("n_events"), col("v_sum"))
      .withColumn("v_ffill", last(col("v_sum"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("bin_s").cast("timestamp").as("bin_ts"),
        col("n_events"), col("v_sum"), col("v_ffill"))
      .orderBy(col("user_id"), col("bin_ts"))
  }

  /** HOPPING (sliding) window aggregate — `window(ts, 1h, 15m)`: each
    * event lands in windowSec/slideSec overlapping windows. Spark's
    * `window()` generator expands memberships map-side (a bounded ×4
    * factor here), then it is the same single map-side-combinable
    * hash agg as [[hourly]] — the batch shape of the streaming
    * sliding-window aggregation in `graft.streaming`. Window starts
    * are whole multiples of the slide, so second-floored oracle
    * arithmetic agrees exactly with Spark's microsecond membership.
    */
  def hopping(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** TIME-WEIGHTED average (TWAP) per user — the metering/pricing
    * aggregate where a value holds until the next observation, so
    * each reading weighs by its holding interval, not its count.
    * One user-keyed window (`lead` for the segment end — the same
    * exchange every sequential operator in this file reuses) then a
    * hash agg. Cross-engine exactness: values fix to integer CENTS
    * before weighting, so the weighted sum is exact integer math —
    * float summation order never matters (the integer-micro
    * discipline).
    */
  def twap(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("sec"),
        floor(col("value") * lit(100.0) + lit(0.5)).cast("long").as("cents"))
      .withColumn("next_sec", lead(col("sec"), 1).over(byUser))
      .filter(col("next_sec").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        sum((col("next_sec") - col("sec")) * col("cents")).as("weighted_c"),
        sum(col("next_sec") - col("sec")).as("span"),
        (count(lit(1)) + lit(1L)).as("n_events"))
      .filter(col("span") > 0)
      .select(col("user_id"), col("n_events"), col("span"),
        (floor(col("weighted_c").cast("double") / col("span").cast("double") /
          lit(100.0) * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("twap"))
      .orderBy(col("user_id"))
  }

  /** Day-of-week × hour-of-day activity HEATMAP — the periodic-load
    * matrix behind capacity planning and anomaly baselines. The
    * day-of-week derives from pure integer epoch arithmetic
    * ((day + 4) mod 7, 0 = Sunday) rather than either engine's
    * calendar function, whose week-start conventions differ — the
    * cross-engine determinism discipline applied to dates. One
    * map-side-combinable hash agg into exactly 168 groups at any
    * event volume.
    */
  def heatmap(s: SparkSession, dir: String): DataFrame = {
    val sec = col("ts").cast("long")
    Tables.events(s, dir)
      .select(
        ((floor(sec / 86400L) + 4L) % 7L).cast("long").as("dow"),
        floor((sec % 86400L) / 3600L).cast("long").as("hour_of_day"),
        col("value"))
      .groupBy(col("dow"), col("hour_of_day"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("dow"), col("hour_of_day"))
  }

  /** Sliding-window DISTINCT users (trailing 24 h per hour) two ways:
    * exact via coverage expansion, and approximate via per-hour HLL
    * sketches merged across the window — with the sketch's accuracy
    * certified IN-ROW against the exact count (the
    * `q26_sketch_bounds` discipline: the oracle pins TRUE, so a
    * sketch drifting past 5 % fails the driver hash-match).
    *
    * Exact branch: each active (user, hour) pair covers the 24
    * window-ends it can influence — a bounded ×24 generator over the
    * DISTINCT pairs (never the raw events), then one dedup + count.
    * Sliding distinct does not decompose algebraically, so any exact
    * method pays per-(user,window) work somewhere; this shape makes
    * it map-side and shuffle-bounded.
    *
    * HLL branch — the one that survives 100 TB: per-hour
    * `hll_sketch_agg` state is CONSTANT-size per hour regardless of
    * user cardinality, the 24-way merge happens on the tiny
    * hours-level relation (`hll_union_agg` over an hour self-join),
    * and the estimate replaces the exact branch wholesale when users
    * no longer fit a dedup shuffle. Mirrors the streaming
    * heavy-hitter discipline in [[graft.streaming.EventStreams]]:
    * mergeable sketch state, arrival-order independent.
    */
  def slidingDistinct(s: SparkSession, dir: String): DataFrame = {
    val au = Tables.events(s, dir)
      .select(date_trunc("hour", col("ts")).as("h"), col("user_id"))
      .distinct()
    val hours = au.select(col("h")).distinct()
    val cov = au.select(col("user_id"),
        explode(sequence(col("h"), col("h") + expr("INTERVAL 23 HOURS"),
          expr("INTERVAL 1 HOUR"))).as("wend"))
      .distinct()
    val exact = cov.join(hours.withColumnRenamed("h", "wend"), "wend")
      .groupBy(col("wend"))
      .agg(count(lit(1)).as("n_exact"))
    val perHour = au.groupBy(col("h")).agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = perHour.toDF("eh", "esk").as("e")
      .join(perHour.as("w"),
        col("w.h") >= col("eh") - expr("INTERVAL 23 HOURS") && col("w.h") <= col("eh"))
      .groupBy(col("eh").as("wend"))
      .agg(hll_sketch_estimate(hll_union_agg(col("w.sk"))).as("n_hll"))
    exact.join(merged, "wend")
      .select(col("wend").as("window_end"), col("n_exact"),
        (abs(col("n_hll").cast("double") - col("n_exact").cast("double")) <=
          col("n_exact").cast("double") * lit(0.05)).as("hll_within_5pct"))
      .orderBy(col("window_end"))
  }

  /** Markov transition matrix over per-user event sequences — the
    * "what happens next" model behind user-path analysis and
    * sequence-level data curation (e.g. filtering sessions with
    * degenerate next-step entropy). One shuffle on user_id orders
    * each user's history; `lead` pairs every event with its
    * successor entirely within that partition; the transition counts
    * then hash-aggregate into at most |event_type|² groups, so the
    * second exchange carries a few dozen rows regardless of corpus
    * size. Transition probability is derived per source state with a
    * window over that tiny aggregate (no second pass over events),
    * and rounded via the [[CrossEngine.rnd4]] contract.
    *
    * 100 TB: the only data-sized operation is the per-user sort —
    * the same exchange every sessionize/funnel/SCD2 pass in this file
    * reuses; everything after it is constant-sized.
    */
  def paths(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
    val byState = Window.partitionBy(col("state"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        date_trunc("second", col("ts")).as("ts_s"),
        col("event_type").as("state"))
      .withColumn("next_state", lead(col("state"), 1).over(byUser))
      .filter(col("next_state").isNotNull)
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("p", CrossEngine.rnd4(
        col("n_transitions").cast("double") /
          sum(col("n_transitions")).over(byState).cast("double")))
      .orderBy(col("state"), col("next_state"))
  }

  /** CDC MERGE-apply: materialize the CURRENT entity snapshot from a
    * keyed changelog — the Delta/Hudi/Iceberg "apply the CDC feed"
    * operator. The event stream reads as a per-user op log (`signup` →
    * insert, `click`/`view`/`purchase` → update, `error` → delete);
    * last-writer-wins by (second-truncated ts, event_id — a total
    * order both engines share), and a key whose LAST op is a delete
    * leaves no row (tombstone). Output carries the surviving state
    * plus per-key op/delete counts for audit.
    *
    * Plan: the ranking window and the count aggregate both hash on
    * user_id. At verification SF, AQE broadcasts the key-sized count
    * relation (with WindowGroupLimit pre-pruning the per-key top-1
    * BEFORE the window exchange); at a scale where counts outgrow
    * broadcast, both sides already share the user_id partitioning, so
    * the join degrades to a co-partitioned merge with the exchange
    * reused — either way the changelog applies in one pass and
    * nothing materializes intermediate snapshots.
    */
  def cdcApply(s: SparkSession, dir: String): DataFrame = {
    val log = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      date_trunc("second", col("ts")).as("ts_s"),
      col("event_type"), col("value"),
      when(col("event_type") === "error", lit("D"))
        .when(col("event_type") === "signup", lit("I"))
        .otherwise(lit("U")).as("op"))
    val byKey = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s").desc, col("event_id").desc)
    val last = log.withColumn("rk", row_number().over(byKey))
      .filter(col("rk") === 1).drop("rk")
    val counts = log.groupBy(col("user_id")).agg(
      count(lit(1)).as("n_ops"),
      sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_deletes"))
    last.join(counts, "user_id")
      .filter(col("op") =!= "D")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts_s").as("last_ts"), col("event_type").as("state"),
        col("value"), col("n_ops"), col("n_deletes"))
      .orderBy(col("user_id"))
  }

  /** Chi-square INDEPENDENCE test on the (day-of-week × event-type)
    * contingency table — "does traffic composition depend on the
    * weekday?", the hypothesis-testing primitive next to the
    * descriptive stats (q18/q42): observed cell counts, expected
    * counts under independence e = row·col/N, per-cell contribution
    * (o−e)²/e, and the test statistic.
    *
    * Determinism: counts are exact bigints; `expected` is ONE IEEE
    * division of exact integer products (identical on both engines);
    * each cell's contribution is rounded to integer MICRO-units
    * before the total, so the chi² total is an exact bigint sum —
    * summation order can't perturb it (the [[CrossEngine]] family's
    * fix-before-sum rule). At any scale the corpus collapses to
    * |dow|×|types| cells in the first map-side-combinable agg;
    * everything after runs on ≤ 35 rows.
    */
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val sec = col("ts").cast("long")
    val cells = Tables.events(s, dir)
      .select(((floor(sec / 86400L) + 4L) % 7L).cast("long").as("dow"),
        col("event_type"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("observed"))
    val withMargins = cells
      .withColumn("row_n", sum(col("observed")).over(Window.partitionBy(col("dow"))))
      .withColumn("col_n", sum(col("observed")).over(Window.partitionBy(col("event_type"))))
      .withColumn("n", sum(col("observed")).over(Window.partitionBy()))
    val contrib = withMargins
      .withColumn("expected",
        (col("row_n") * col("col_n")).cast("double") / col("n").cast("double"))
      .withColumn("contrib_micro",
        floor((col("observed").cast("double") - col("expected")) *
          (col("observed").cast("double") - col("expected")) / col("expected")
          * lit(1000000.0) + lit(0.5)).cast("long"))
    contrib
      .withColumn("chi2_total",
        sum(col("contrib_micro")).over(Window.partitionBy()).cast("double") / lit(1000000.0))
      .select(col("dow"), col("event_type"), col("observed"),
        CrossEngine.rnd4(col("expected")).as("expected"),
        col("contrib_micro"), col("chi2_total"))
      .orderBy(col("dow"), col("event_type"))
  }

  /** Multi-touch marketing ATTRIBUTION: credit click/view touchpoints
    * for each purchase under the three standard models at once —
    * first-touch, last-touch, and linear — over a 7-day lookback.
    * Touch candidates come from a user-keyed equi-join with the
    * window predicate inside the join condition (per-user pair volume
    * is bounded by per-user activity, never cross-user), first/last
    * selection is a per-purchase ranking window with an event-id
    * tiebreak (second-floored timestamps tie often by construction),
    * and linear credit is distributed in INTEGER micro-units
    * (`1e6 DIV n_touches` per touch) so per-channel sums are exact
    * bigints on both engines. Purchases with no touch in the window
    * credit the explicit `(none)` channel — unattributed conversions
    * stay visible instead of silently vanishing.
    */
  def attribution(s: SparkSession, dir: String,
                  lookbackSec: Long = 7L * 86400): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_s"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts_s").as("p_ts"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("t_user"), col("event_id").as("t_id"),
        col("ts_s").as("t_ts"), col("event_type").as("channel"))
    val joined = purchases.join(touches,
      purchases("user_id") === touches("t_user") &&
        touches("t_ts") < purchases("p_ts") &&
        touches("t_ts") >= purchases("p_ts") - lit(lookbackSec),
      "left")
      .select(col("p_id"), col("t_id"), col("t_ts"), col("channel"))
    val wF = Window.partitionBy(col("p_id")).orderBy(col("t_ts").asc, col("t_id").asc)
    val wL = Window.partitionBy(col("p_id")).orderBy(col("t_ts").desc, col("t_id").desc)
    val ranked = joined
      .withColumn("rf", row_number().over(wF))
      .withColumn("rl", row_number().over(wL))
    val firsts = ranked.filter(col("rf") === 1)
      .groupBy(coalesce(col("channel"), lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    val lasts = ranked.filter(col("rl") === 1)
      .groupBy(coalesce(col("channel"), lit("(none)")).as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    val linear = joined.filter(col("t_id").isNotNull)
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("p_id"))))
      .groupBy(col("channel"))
      .agg(sum(expr("1000000L DIV n")).as("linear_credit_micro"))
    firsts.join(lasts, Seq("channel"), "full")
      .join(linear, Seq("channel"), "full")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"),
        coalesce(col("linear_credit_micro"), lit(0L)).as("linear_credit_micro"))
      .orderBy(col("channel"))
  }

  /** Classical seasonal-trend decomposition of the daily event-count
    * series (the moving-average skeleton STL iterates on): trend =
    * CENTERED 7-day moving average (null at the edges where the
    * window is partial — no invented data), seasonal = per-day-of-week
    * mean of the detrended interior, remainder = what's left. The
    * decomposition the capacity-planning / anomaly-triage layer runs
    * over ingest volumes before flagging drift.
    *
    * Determinism discipline: the daily series is densified over an
    * explicit day spine (missing days count 0, so the ROWS frame is a
    * true calendar window), and every fractional value is a SINGLE
    * division of exact integer sums — trend keeps its windowed SUM
    * (bigint) and divides once; the seasonal mean folds to
    * `(7·Σn − Σtrend_sum) / (7·cnt)`, one division of exact integers —
    * then rounds by the [[CrossEngine.rnd4]] contract before emission,
    * so both engines agree at the bit level.
    *
    * Scale: the series is one row per DAY — aggregation collapses any
    * event volume in the first map-side-combinable pass, and
    * everything after operates on a frame thousands of rows long at
    * century scale. The unpartitioned windows are deliberate: they run
    * on the collapsed series, not the corpus.
    */
  def stl(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"))
      .groupBy(col("day_d")).agg(count(lit(1)).as("n_events"))
    val spine = daily0.agg(min(col("day_d")).as("lo"), max(col("day_d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day_d"))
    val daily = spine.join(daily0, Seq("day_d"), "left")
      .select(col("day_d"), coalesce(col("n_events"), lit(0L)).as("n"))
    val w7 = Window.orderBy(col("day_d")).rowsBetween(-3, 3)
    val trended = daily
      .withColumn("t_sum", sum(col("n")).over(w7))
      .withColumn("t_cnt", count(lit(1)).over(w7))
      // exact bigint window sum carried forward; divided ONCE at emission
      .withColumn("trend_sum", when(col("t_cnt") === 7, col("t_sum")))
      .withColumn("dow", ((col("day_d") + 4L) % 7L).cast("long"))
    val seasonal = trended.filter(col("trend_sum").isNotNull)
      .groupBy(col("dow"))
      .agg(CrossEngine.rnd4(
        (lit(7L) * sum(col("n")) - sum(col("trend_sum"))).cast("double") /
          (lit(7.0) * count(lit(1)))).as("seasonal"))
    trended.join(broadcast(seasonal), Seq("dow"), "left")
      .select(
        (col("day_d") * 86400L).cast("timestamp").as("day_ts"),
        col("dow"), col("n").as("n_events"),
        CrossEngine.rnd4(col("trend_sum").cast("double") / lit(7.0)).as("trend"),
        when(col("trend_sum").isNotNull, col("seasonal")).as("seasonal"),
        CrossEngine.rnd4(col("n").cast("double") -
          col("trend_sum").cast("double") / lit(7.0) - col("seasonal")).as("remainder"))
      .orderBy(col("day_ts"))
  }

  /** EWMA smoothing of the daily per-type value series — the
    * classic trend-following smoother a metrics/quality pipeline
    * layers over raw dailies. α = 1/4, TRUNCATED at 8 taps: the
    * dropped tail carries weight (3/4)^8 ≈ 10%, renormalized away by
    * dividing through the realized weight mass, which also gives the
    * standard "adjusted" EWMA warm-up at the series head.
    *
    * Cross-engine exactness by construction: values enter as integer
    * CENTS (`floor(v*100+0.5)` per row, then an associative BIGINT
    * sum — no float-sum order sensitivity), and the 8 tap weights are
    * the INTEGERS wᵢ = 3ⁱ·4^(7−ⁱ) (α(1−α)ⁱ·4⁸), so numerator and
    * denominator are exact BIGINTs on both engines; the single final
    * division of identical integers is bit-identical, then rnd4.
    *
    * Scale shape: the only corpus-sized stage is the daily hash agg
    * (map-side combinable, one shuffle). The window runs over the
    * AGGREGATED series — days × event_types rows, thousands at 100 TB
    * — so the per-type window partition skew is irrelevant; spine
    * fill guarantees the taps are calendar-contiguous.
    */
  /** Holt-Winters triple exponential smoothing (additive, weekly
    * seasonality) over the daily event-count series, plus a 14-day
    * forecast — the classic capacity-planning / anomaly-baseline
    * forecaster a metrics pipeline layers over raw dailies.
    *
    * Cross-engine exactness by construction (the svmClassifier
    * discipline): state lives in integer MICROS and every smoothing
    * step is `Math.floorDiv` over exact BIGINTs with the rational
    * constants α=3/10, β=1/10, γ=2/10 — no float drift anywhere, so
    * the DuckDB oracle replays the recursion bit-for-bit with a
    * recursive CTE carrying the 7-slot seasonal window as a LIST.
    * Init: l₀ = mean(week 1), b₀ = (mean(week 2) − mean(week 1))/7,
    * sⱼ = yⱼ − l₀ — requires ≥ 15 days of spine, enforced loudly.
    *
    * Scale shape: the ONLY corpus-sized stage is the daily hash agg
    * (map-side combinable, one shuffle). The recurrence is inherently
    * sequential, so it runs on the driver over the 0-filled day
    * spine — time-span-sized (30 rows here, ≤ thousands for decades
    * of data), never data-sized; the result frame is spine+horizon
    * rows. Emitted `yhat_micro` on fit rows is the ONE-STEP-AHEAD
    * forecast (made before seeing that day), so fit error is honest.
    */
  def holtWinters(s: SparkSession, dir: String,
                  horizon: Int = 14): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"))
      .groupBy(col("day_d")).agg(count(lit(1)).as("n"))
    holtWintersOf(daily0, horizon)
  }

  /** The smoothing core over a (day_d, n) daily frame — split out so
    * specs can drive it with planted series of known structure. */
  def holtWintersOf(daily0: DataFrame, horizon: Int): DataFrame = {
    val s = daily0.sparkSession
    import s.implicits._
    val spineDf = daily0.agg(min(col("day_d")).as("lo"), max(col("day_d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day_d"))
      .join(daily0, Seq("day_d"), "left")
      .select(col("day_d"), coalesce(col("n"), lit(0L)).as("y"))
      .orderBy(col("day_d"))
    val spine = spineDf.collect().map(r => (r.getLong(0), r.getLong(1)))
    val T = spine.length
    if (T < 15) throw new IllegalStateException(
      s"holtWinters needs >= 15 days of data (weekly init + one step), got $T")
    val y = spine.map(_._2)
    def fd(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val M = 1000000L
    val w1 = y.slice(0, 7).sum
    val w2 = y.slice(7, 14).sum
    var l = fd(w1 * M, 7L)
    var b = fd((w2 - w1) * M, 49L)
    // seasonal init is DETRENDED: s_j = y_j − (l₀ + (j−3)·b₀) — the
    // raw y_j − l₀ would absorb week-1's trend into the seasonal
    // slots (error up to ±3b₀), which γ=0.2 takes many cycles to
    // unlearn; centering at mid-week (j=3) keeps s summing ≈ 0
    val seas = scala.collection.mutable.ArrayBuffer[Long](
      (0 until 7).map(j => y(j) * M - (l + (j - 3L) * b)): _*)
    val rows = scala.collection.mutable.ListBuffer[
      (Long, String, Option[Long], Option[Long], Option[Long], Option[Long], Option[Long])]()
    for (t <- 7 until T) {
      val sPrev = seas(t - 7)
      val yhat = l + b + sPrev
      val lNew = fd(3L * (y(t) * M - sPrev) + 7L * (l + b), 10L)
      val bNew = fd(1L * (lNew - l) + 9L * b, 10L)
      val sNew = fd(2L * (y(t) * M - lNew) + 8L * sPrev, 10L)
      rows += ((spine(t)._1, "fit", Some(y(t)), Some(lNew), Some(bNew),
        Some(sNew), Some(yhat)))
      seas += sNew
      l = lNew; b = bNew
    }
    // split-conformal 90% interval: q = the ⌈0.9·(n+1)⌉-th smallest
    // absolute one-step fit residual (the standard conformal index,
    // computed as the INTEGER law ⌊(9(n+1)+9)/10⌋ clamped to n — no
    // float at the boundary), attached to every forecast row as
    // yhat ± q. Distribution-free coverage ≥ 90% under
    // exchangeability of the one-step errors; exact BIGINT
    // order statistic, so the oracle replays it bit-for-bit.
    val resid = rows.map(r => math.abs(r._3.get * M - r._7.get)).sorted
    val qIdx = math.min(resid.length.toLong,
      Math.floorDiv(9L * (resid.length + 1) + 9L, 10L)).toInt
    val q = resid(qIdx - 1)
    val out = rows.map { case (d, k, y, l0, b0, s0, yh) =>
      (d, k, y, l0, b0, s0, yh, None: Option[Long], None: Option[Long])
    } ++ (1 to horizon).map { step =>
      val sIdx = T - 1 + step - 7 * ((step + 6) / 7)
      val yh = l + step.toLong * b + seas(sIdx)
      (spine(T - 1)._1 + step, "forecast", None: Option[Long],
        None: Option[Long], None: Option[Long], None: Option[Long],
        Some(yh), Some(yh - q), Some(yh + q))
    }
    out.toSeq
      .toDF("day_d", "kind", "y", "level_micro", "trend_micro",
        "season_micro", "yhat_micro", "lo90_micro", "hi90_micro")
      .select((col("day_d") * 86400L).cast("timestamp").as("day_ts"),
        col("kind"), col("y"), col("level_micro"), col("trend_micro"),
        col("season_micro"), col("yhat_micro"), col("lo90_micro"),
        col("hi90_micro"))
      .orderBy(col("day_ts"))
  }

  /** Rolling-origin FORECAST BACKTEST — the evaluation harness for
    * the forecasting family (the pattern every other model family
    * here already has: txt_ndcg for retrieval, q59_cv_ols for
    * regression, vec_silhouette for clustering, txt_calibration for
    * the classifier): hold out the LAST `horizon` days, train
    * [[holtWinters]] on the truncated series, and score each
    * forecast step against the actual — per-step absolute error in
    * micros, sMAPE on the 1e-4 grid (2·|f−a| DIV (f+a), exact
    * integers), and whether the split-conformal 90% band covered the
    * actual. A model whose band covers ≪ 90% of holdout steps or
    * whose sMAPE drifts with step is telling you the seasonality
    * model is wrong — BEFORE you ship the forecast.
    *
    * All arithmetic inherits the forecaster's exact fixed-point
    * discipline, so the whole scorecard hashes; the only additions
    * are integer compares and floorDivs. Scale shape: identical to
    * [[holtWinters]] (one daily hash agg; the recursion runs on the
    * truncated time-span-sized spine).
    */
  def backtest(s: SparkSession, dir: String, horizon: Int = 14): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"))
      .groupBy(col("day_d")).agg(count(lit(1)).as("n"))
    backtestOf(daily0, horizon)
  }

  /** The harness core over any (day_d, n) daily frame. */
  def backtestOf(daily0: DataFrame, horizon: Int): DataFrame = {
    val hiRow = daily0.agg(max(col("day_d")).as("hi")).head()
    if (hiRow.isNullAt(0)) {
      // empty series: nothing to hold out — empty readout with the
      // output schema beats an unboxing NPE (the cupedAb guard)
      val sp = daily0.sparkSession
      return sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "step BIGINT, day_ts TIMESTAMP, y BIGINT, yhat_micro BIGINT, " +
            "abs_err_micro BIGINT, smape_1e4 BIGINT, in_band BOOLEAN"))
    }
    val hi = hiRow.getLong(0)
    val cut = hi - horizon
    val fc = holtWintersOf(daily0.filter(col("day_d") <= cut), horizon)
      .filter(col("kind") === "forecast")
      .select((col("day_ts").cast("long") / 86400L).cast("long").as("day_d"),
        col("yhat_micro"), col("lo90_micro"), col("hi90_micro"))
    val s = daily0.sparkSession
    import s.implicits._
    // 0-filled holdout actuals (a missing day is a 0-count day, the
    // spine discipline)
    val holdout = (cut + 1 to hi).map(d => d).toDF("day_d")
      .join(daily0, Seq("day_d"), "left")
      .select(col("day_d"), coalesce(col("n"), lit(0L)).as("y"))
    fc.join(holdout, "day_d")
      .withColumn("step", col("day_d") - lit(cut))
      .withColumn("abs_err_micro", abs(col("y") * lit(1000000L) - col("yhat_micro")))
      .withColumn("smape_1e4",
        when(col("y") * lit(1000000L) + col("yhat_micro") > 0L,
          expr("(2L * abs_err_micro * 10000L) DIV (y * 1000000L + yhat_micro)"))
          .otherwise(0L))
      .withColumn("in_band",
        col("y") * lit(1000000L) >= col("lo90_micro") &&
          col("y") * lit(1000000L) <= col("hi90_micro"))
      .select(col("step"),
        (col("day_d") * 86400L).cast("timestamp").as("day_ts"),
        col("y"), col("yhat_micro"), col("abs_err_micro"),
        col("smape_1e4"), col("in_band"))
      .orderBy(col("step"))
  }

  /** Changepoint detection over the daily event-count series —
    * fixed-depth (2) BINARY SEGMENTATION: the best split of the full
    * series by the classic variance-reduction criterion, then the
    * best split of each resulting side, yielding up to 4 segments.
    * The drift detector a training-data pipeline runs over ingest
    * volumes (a corpus mix shifting under a fixed pipeline shows up
    * as mean shifts in per-source dailies). Fixed depth + a minimum
    * segment length of 4 days keeps the procedure deterministic and
    * certifiable; significance testing is the consumer's layer (the
    * emitted per-segment means make the effect size visible).
    *
    * EXACT integer arithmetic throughout (the Holt-Winters
    * discipline): minimizing SSE_l + SSE_r is equivalent to
    * MAXIMIZING f(k) = S_l²/n_l + S_r²/n_r (the Σy² term is split-
    * invariant), and f(k) > f(k′) is decided by the BIGINT
    * cross-product (S_l²·n_r + S_r²·n_l)·(n_l′·n_r′) vs the mirror —
    * no float ever touches the argmax, so the DuckDB oracle replays
    * the selection bit-for-bit (ties break toward the smaller k).
    * Magnitudes: |S|²·n³ must fit in a signed 64-bit — fine for any
    * series with ≤ ~10⁷ events per day-window at month spans; scale
    * counts down before calling for extreme volumes.
    *
    * Scale shape: the corpus collapses in the daily hash agg; the
    * segmentation runs on the driver over the 0-filled day spine
    * (time-span-sized), same as [[holtWinters]].
    */
  def changepoints(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"))
      .groupBy(col("day_d")).agg(count(lit(1)).as("n"))
    changepointsOf(daily0)
  }

  /** The segmentation core over a (day_d, n) daily frame. */
  def changepointsOf(daily0: DataFrame, minLen: Int = 4): DataFrame = {
    val s = daily0.sparkSession
    import s.implicits._
    val spine = daily0
      .agg(min(col("day_d")).as("lo"), max(col("day_d")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day_d"))
      .join(daily0, Seq("day_d"), "left")
      .select(col("day_d"), coalesce(col("n"), lit(0L)).as("y"))
      .orderBy(col("day_d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val y = spine.map(_._2)
    // prefix sums; BigInt only for the comparison cross-products
    val pre = y.scanLeft(0L)(_ + _) // pre(i) = Σ y[0,i)
    // best split of [lo, hi): argmax of S_l²/n_l + S_r²/n_r over
    // k ∈ [lo+minLen, hi−minLen], exact rational compare, min-k ties
    def bestSplit(lo: Int, hi: Int): Option[Int] = {
      val cands = (lo + minLen) to (hi - minLen)
      if (cands.isEmpty) return None
      def score(k: Int): (BigInt, BigInt) = {
        val sl = BigInt(pre(k) - pre(lo)); val nl = BigInt(k - lo)
        val sr = BigInt(pre(hi) - pre(k)); val nr = BigInt(hi - k)
        (sl * sl * nr + sr * sr * nl, nl * nr)
      }
      Some(cands.reduceLeft { (a, b) =>
        val (na, da) = score(a); val (nb, db) = score(b)
        if (nb * da > na * db) b else a // strict: ties keep smaller k
      })
    }
    val cuts = scala.collection.mutable.SortedSet[Int]()
    bestSplit(0, y.length).foreach { k1 =>
      cuts += k1
      bestSplit(0, k1).foreach(cuts += _)
      bestSplit(k1, y.length).foreach(cuts += _)
    }
    val bounds = (0 +: cuts.toSeq) :+ y.length
    val segs = bounds.sliding(2).zipWithIndex.map { case (Seq(a, b), i) =>
      val total = pre(b) - pre(a)
      (i.toLong, spine(a)._1, spine(b - 1)._1, (b - a).toLong, total,
        Math.floorDiv(total * 1000000L, (b - a).toLong))
    }.toSeq
    segs.toDF("seg", "start_day", "end_day", "n_days", "n_events", "mean_micro")
      .select(col("seg"),
        (col("start_day") * 86400L).cast("timestamp").as("start_ts"),
        (col("end_day") * 86400L).cast("timestamp").as("end_ts"),
        col("n_days"), col("n_events"), col("mean_micro"))
      .orderBy(col("seg"))
  }

  /** Autocorrelation function (ACF) of the per-type daily event-count
    * series at lags 1..14 — the SEASONALITY DETECTOR that decides
    * whether the forecasting layer ([[holtWinters]]) should model a
    * weekly cycle at all, and at what period: a genuine weekly rhythm
    * shows as the lag-7 autocorrelation dominating lags 1..14. Box &
    * Jenkins 1970 correlogram, restated in the engine's exact-integer
    * discipline.
    *
    * EXACT arithmetic end to end: the series 0-fills onto the per-type
    * day spine, deviations are CENT-scaled integers about the
    * floor-mean (d_t = 100·y_t − ⌊100·Σy / n⌋ — the fix-before-sum
    * rule: both engines square and cross-multiply the same BIGINTs),
    * acf(h) = ⌊10⁴·Σ_t d_t·d_{t+h} / Σ_t d_t²⌋ by the pmod floor-div
    * construction, and the dominant lag is a row_number over the
    * integer numerators (den is lag-invariant, so comparing Σd·d_h
    * IS comparing acf) with min-lag ties. Magnitude contract:
    * |Σ d_t·d_{t+h}|·10⁴ ≤ 10⁴·Σd² must fit signed-64 — holds to
    * ~10⁸ events/day at month spans (|d| ≤ 100·y_max, Cauchy–Schwarz
    * bounds every numerator by the denominator); scale counts first
    * for extreme volumes, same contract as [[changepoints]].
    *
    * Scale shape: the corpus collapses in the daily hash agg (one
    * map-side-combinable shuffle); the spine join, the 14 lead taps
    * and both reductions run on the bounded (types × days) frame —
    * the lag window partitions by event_type, so no global window
    * ever forms.
    */
  def acf(s: SparkSession, dir: String): DataFrame =
    acfOf(Tables.events(s, dir)
      .select(col("event_type"),
        floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"))
      .groupBy(col("event_type"), col("day_d"))
      .agg(count(lit(1)).as("n")))

  /** The correlogram core over any (event_type, day_d, n) daily frame
    * — split out so specs can drive it with planted periodic series. */
  def acfOf(daily0: DataFrame, maxLag: Int = 14): DataFrame = {
    val spine = daily0.groupBy(col("event_type"))
      .agg(min(col("day_d")).as("lo"), max(col("day_d")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("day_d"))
    val daily = spine.join(daily0, Seq("event_type", "day_d"), "left")
      .select(col("event_type"), col("day_d"),
        coalesce(col("n"), lit(0L)).as("y"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("y")).as("s_tot"))
    val dev = daily.join(broadcast(stats), "event_type")
      .withColumn("d", col("y") * lit(100L) -
        expr("(s_tot * 100L - pmod(s_tot * 100L, n_days)) DIV n_days"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_d"))
    val taps = (1 to maxLag).map(h => lead(col("d"), h).over(w).as(s"d$h"))
    val wide = dev.select(
      Seq(col("event_type"), col("n_days"), col("d")) ++ taps: _*)
    val den = wide.groupBy(col("event_type"))
      .agg(sum(col("d") * col("d")).as("den"))
    val stacked = wide.select(col("event_type"), col("n_days"),
      explode(array((1 to maxLag).map(h =>
        struct(lit(h.toLong).as("lag"),
          (col("d") * col(s"d$h")).as("prod"))): _*)).as("lp"))
      .select(col("event_type"), col("n_days"),
        col("lp.lag").as("lag"), col("lp.prod").as("prod"))
    val num = stacked.filter(col("prod").isNotNull)
      .groupBy(col("event_type"), col("lag"))
      .agg(min(col("n_days")).as("n_days"),
        count(lit(1)).as("n_pairs"), sum(col("prod")).as("num"))
    val dom = Window.partitionBy(col("event_type"))
      .orderBy(col("num").desc, col("lag").asc)
    num.join(broadcast(den), "event_type")
      .withColumn("acf_1e4", when(col("den") > 0L,
        expr("(num * 10000L - pmod(num * 10000L, den)) DIV den"))
        .otherwise(lit(0L)))
      .withColumn("is_dominant", row_number().over(dom) === 1)
      .select(col("event_type"), col("lag"), col("n_days"),
        col("n_pairs"), col("acf_1e4"), col("is_dominant"))
      .orderBy(col("event_type"), col("lag"))
  }

  /** CROSS-correlation between event-type daily series at lags
    * −7..+7 — [[acf]]'s pair companion and the LEAD-LAG detector: a
    * peak at lag h > 0 for (a, b) means a's daily volume leads b's by
    * h days (the "signups today, purchases in three days" readout
    * that drives capacity and attribution decisions). Series 0-fill
    * onto the GLOBAL day spine so every pair aligns; deviations are
    * the cent-scaled integers about each type's floor-mean (the acf
    * discipline) and every sum is an exact BIGINT.
    *
    * Normalization without a determinism hole: Pearson's r divides by
    * √den_a·√den_b — and IEEE-754 `sqrt` is an EXACTLY-ROUNDED
    * operation (unlike ln/exp), so sqrt of the same exact-integer-
    * derived double is the same double on both engines, the pinned
    * num/(sqrt·sqrt) order gives the same quotient, and the rnd4
    * boundary is deterministic, not just probable. The PEAK lag is
    * flagged by row_number over the exact integer numerators (den is
    * lag-invariant per pair) with min-lag ties — the acf dominant-lag
    * law extended to a signed lag range.
    *
    * Scale shape: one corpus-collapsing daily hash agg; the lag
    * expansion and the pair join run on the bounded types×days frame
    * (pairs are type-vocabulary-sized); windows partition by pair.
    */
  def xcorr(s: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(col("event_type"),
        floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"))
      .groupBy(col("event_type"), col("day_d"))
      .agg(count(lit(1)).as("n"))
    xcorrOf(daily0, maxLag)
  }

  /** The estimator core over any (event_type, day_d, n) daily frame. */
  def xcorrOf(daily0: DataFrame, maxLag: Int = 7): DataFrame = {
    // GLOBAL spine so pair series align day-for-day
    val bounds = daily0.agg(min(col("day_d")).as("lo"), max(col("day_d")).as("hi"))
    val types = daily0.select(col("event_type")).distinct()
    val spine = types.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"))).as("day_d"))
    val daily = spine.join(daily0, Seq("event_type", "day_d"), "left")
      .select(col("event_type"), col("day_d"),
        coalesce(col("n"), lit(0L)).as("y"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("y")).as("s_tot"))
    val dev = daily.join(broadcast(stats), "event_type")
      .withColumn("d", col("y") * lit(100L) -
        expr("(s_tot * 100L - pmod(s_tot * 100L, n_days)) DIV n_days"))
      .select(col("event_type"), col("day_d"), col("d"))
    val den = dev.groupBy(col("event_type"))
      .agg(sum(col("d") * col("d")).as("den"))
    val lags = (-maxLag to maxLag).map(_.toLong)
    val a = dev.select(col("event_type").as("type_a"), col("day_d"), col("d").as("da"))
      .withColumn("lag", explode(lit(lags.toArray)))
    val b = dev.select(col("event_type").as("type_b"),
      col("day_d").as("day_b"), col("d").as("db"))
    val num = a.join(b,
        col("type_a") < col("type_b") && col("day_b") === col("day_d") + col("lag"))
      .groupBy(col("type_a"), col("type_b"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("da") * col("db")).as("num"))
    val peak = Window.partitionBy(col("type_a"), col("type_b"))
      .orderBy(col("num").desc, col("lag").asc)
    num
      .join(broadcast(den.select(col("event_type").as("type_a"), col("den").as("den_a"))), "type_a")
      .join(broadcast(den.select(col("event_type").as("type_b"), col("den").as("den_b"))), "type_b")
      .withColumn("r4", when(col("den_a") > 0L && col("den_b") > 0L,
        CrossEngine.rnd4(col("num").cast("double") /
          (sqrt(col("den_a").cast("double")) * sqrt(col("den_b").cast("double")))))
        .otherwise(lit(0.0)))
      .withColumn("is_peak", row_number().over(peak) === 1)
      .select(col("type_a"), col("type_b"), col("lag"), col("n_pairs"),
        col("r4"), col("is_peak"))
      .orderBy(col("type_a"), col("type_b"), col("lag"))
  }

  /** DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator the
    * A/B family (CUPED, bootstrap, chi-square, power) was missing for
    * the cases WITHOUT randomized concurrent exposure: compare the
    * treated arm's pre→post change against the control arm's, so any
    * shared trend cancels and the residual is the treatment effect
    * (under the parallel-trends assumption the spec exercises both
    * ways). Arms come from the md5 user split (the CUPED idiom),
    * periods from the exact integer midpoint of the observed day
    * span. ONE conditional-aggregate scan produces all eight cell
    * statistics per event type (exact BIGINT sums and counts); cell
    * means and the DiD estimate are pinned-order doubles from those
    * exact integers, rnd4'd — the q42 determinism contract.
    */
  def did(s: SparkSession, dir: String): DataFrame =
    didOf(Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"),
        round(col("value") * 100.0).cast("long").as("cents")))

  /** The estimator core over any (event_type, user_id, day_d, cents)
    * relation. */
  def didOf(ev: DataFrame): DataFrame = {
    val b = ev.agg(min(col("day_d")).as("lo"), max(col("day_d")).as("hi")).head()
    if (b.isNullAt(0)) {
      // degenerate input: no events, no experiment — an empty readout
      // with the output schema beats an unboxing NPE (the cupedAb guard)
      val sp = ev.sparkSession
      return sp.createDataFrame(sp.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "event_type STRING, n_treat_pre BIGINT, mean_treat_pre DOUBLE, " +
            "n_treat_post BIGINT, mean_treat_post DOUBLE, n_ctrl_pre BIGINT, " +
            "mean_ctrl_pre DOUBLE, n_ctrl_post BIGINT, mean_ctrl_post DOUBLE, " +
            "did_value DOUBLE"))
    }
    val mid = Math.floorDiv(b.getLong(0) + b.getLong(1) + 1L, 2L)
    val tagged = ev
      .withColumn("treat",
        (conv(substring(md5(concat(lit("did:"), col("user_id").cast("string"))),
          1, 4), 16, 10).cast("long") % 2L) === 1L)
      .withColumn("post", col("day_d") >= mid)
    def cell(t: Boolean, p: Boolean, agg: String) = {
      val c = col("treat") === t && col("post") === p
      if (agg == "n") sum(when(c, 1L).otherwise(0L))
      else sum(when(c, col("cents")).otherwise(0L))
    }
    val d = (c: String) => col(c).cast("double")
    tagged.groupBy(col("event_type"))
      .agg(cell(true, false, "n").as("n_tp"), cell(true, false, "s").as("s_tp"),
        cell(true, true, "n").as("n_tq"), cell(true, true, "s").as("s_tq"),
        cell(false, false, "n").as("n_cp"), cell(false, false, "s").as("s_cp"),
        cell(false, true, "n").as("n_cq"), cell(false, true, "s").as("s_cq"))
      .filter(col("n_tp") > 0L && col("n_tq") > 0L &&
        col("n_cp") > 0L && col("n_cq") > 0L)
      .withColumn("mean_treat_pre", CrossEngine.rnd4(d("s_tp") / d("n_tp") / lit(100.0)))
      .withColumn("mean_treat_post", CrossEngine.rnd4(d("s_tq") / d("n_tq") / lit(100.0)))
      .withColumn("mean_ctrl_pre", CrossEngine.rnd4(d("s_cp") / d("n_cp") / lit(100.0)))
      .withColumn("mean_ctrl_post", CrossEngine.rnd4(d("s_cq") / d("n_cq") / lit(100.0)))
      .withColumn("did_value", CrossEngine.rnd4(
        (d("s_tq") / d("n_tq") - d("s_tp") / d("n_tp")
          - (d("s_cq") / d("n_cq") - d("s_cp") / d("n_cp"))) / lit(100.0)))
      .select(col("event_type"),
        col("n_tp").as("n_treat_pre"), col("mean_treat_pre"),
        col("n_tq").as("n_treat_post"), col("mean_treat_post"),
        col("n_cp").as("n_ctrl_pre"), col("mean_ctrl_pre"),
        col("n_cq").as("n_ctrl_post"), col("mean_ctrl_post"),
        col("did_value"))
      .orderBy(col("event_type"))
  }

  /** GINI concentration of event volume across users, per event type
    * — the whale-detection / load-imbalance audit (a Gini near 0 =
    * uniform usage, near 1 = a handful of users generate everything;
    * the same number also prices how badly a user-keyed shuffle will
    * skew). Exact rational: with per-user totals x ranked ascending
    * i = 1..n, Gini = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx), all BIGINT, one
    * pmod floorDiv to the 1e-6 grid. `top10_share_1e4` (volume held
    * by the top decile of users) rides along as the operational
    * readout of the same ranking.
    *
    * Scale shape: the corpus collapses to per-(type, user) totals in
    * one hash agg; the ascending rank comes from ONE sharded
    * global-rank pass over (type, x, user) — the certified
    * `txt_global_ids` construction, NO unpartitioned and NO
    * type-partitioned user-sized window — and within-type ranks are
    * the global rank minus the broadcast per-type base. Magnitude
    * contract: Σi·xᵢ can reach n·Σx, so signed-64 wraps past
    * n·Σx ≈ 4.6·10¹² — far short of a 10⁹-user corpus. The sums
    * therefore ACCUMULATE in DECIMAL(38,0) (mirroring DuckDB's
    * silent HUGEINT promotion — widening only after a LongType agg
    * would wrap inside the partial sums, the r12 review finding),
    * keeping the whole score exact while the numerator
    * 2·n·Σx·10⁶ ≲ 10³⁸, i.e. to n·Σx ≈ 10³¹; only the REPORTED
    * n_events column is bounded by its BIGINT output cast.
    */
  def gini(s: SparkSession, dir: String): DataFrame =
    giniOf(Tables.events(s, dir).select(col("event_type"), col("user_id")))

  /** The audit core over any (event_type, user_id) event relation. */
  def giniOf(ev: DataFrame): DataFrame =
    giniOfTotals(ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x")))

  /** The ranking+score core over pre-aggregated per-user totals
    * (event_type, user_id, x: BIGINT) — split out so specs can plant
    * totals large enough to exercise the DECIMAL(38,0) numerator
    * path (x values no event fixture could reach by row count). */
  def giniOfTotals(totals: DataFrame): DataFrame = {
    val (ranked, _) = TextAnalysis.withShardedRank(totals, "g", 32,
      Seq(col("event_type"), col("x"), col("user_id")))
    val base = ranked.groupBy(col("event_type"))
      .agg(min(col("g")).as("g0"))
    val r = ranked.join(broadcast(base), "event_type")
      .withColumn("i", col("g") - col("g0") + lit(1L))
    // aggregate IN decimal (r12 review closure): s1 = Σi·xᵢ can reach
    // n·Σx and a LongType sum wraps during accumulation long before
    // the score arithmetic — decimal partials keep the whole chain
    // exact to 38 digits, matching DuckDB's HUGEINT sums
    val agg = r.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast("decimal(38,0)")).as("n_events"),
        sum(col("i").cast("decimal(38,0)") * col("x")).as("s1"))
    // top decile = the heaviest max(1, ⌊n/10⌋) users — the max(·,1)
    // floor keeps SMALL types in the audit (review finding: nu < 10
    // made the decile empty and the inner join silently dropped the
    // type — exactly the classes a concentration audit must not
    // lose); the left join + coalesce below is belt-and-braces for
    // the same failure shape
    val top = r.join(broadcast(agg.select(col("event_type"), col("n_users").as("nu"))),
        "event_type")
      .filter(col("i") > col("nu") - greatest(expr("nu DIV 10"), lit(1L)))
      .groupBy(col("event_type"))
      .agg(sum(col("x").cast("decimal(38,0)")).as("top_x"))
    agg.join(broadcast(top), Seq("event_type"), "left")
      .withColumn("top_x", coalesce(col("top_x"), lit(0).cast("decimal(38,0)")))
      // DECIMAL(38,0) intermediates: 2·s1·10⁶ wraps signed-64 past
      // n·Σx ≈ 4.6·10¹² while DuckDB promotes to HUGEINT — decimal
      // keeps the two engines bitwise-aligned at scale. IntegralDivide
      // on decimals already yields BIGINT, matching the schema.
      .withColumn("gini_num", expr(
        """(2L * CAST(s1 AS DECIMAL(38,0))
          | - (CAST(n_users AS DECIMAL(38,0)) + 1L)
          |   * CAST(n_events AS DECIMAL(38,0))) * 1000000L""".stripMargin))
      .withColumn("gini_den", expr(
        "CAST(n_users AS DECIMAL(38,0)) * CAST(n_events AS DECIMAL(38,0))"))
      .withColumn("gini_1e6", expr(
        "(gini_num - pmod(gini_num, gini_den)) DIV gini_den"))
      .withColumn("top10_share_1e4", expr(
        "(CAST(top_x AS DECIMAL(38,0)) * 10000L) DIV n_events"))
      // output representation stays BIGINT (the oracle CASTs its
      // HUGEINT sums the same way); the cast bounds only what can be
      // REPORTED per column, not the score arithmetic above
      .select(col("event_type"), col("n_users"),
        col("n_events").cast("long").as("n_events"),
        col("gini_1e6"), col("top10_share_1e4"))
      .orderBy(col("event_type"))
  }

  /** A/B-test POWER analysis — the sample-size calculator the
    * experimentation stack (CUPED, bootstrap, chi-square) was
    * missing: per event type, the per-user value distribution's
    * exact integer moments give σ², and the required users PER ARM
    * to detect a relative lift of mde% at α = 0.05 (two-sided) with
    * 80% power is n = ⌈(z₀.₉₇₅ + z₀.₈)² · 2σ² / δ²⌉, δ = mde·mean.
    * The two normal quantiles are FROZEN micro literals
    * (1959964, 841621 — the txt_ndcg discount-table discipline: the
    * only transcendentals in the formula are shared constants), so
    * every downstream double derives from exact integers with a
    * pinned operation order and the ceil is engine-deterministic.
    *
    * Scale shape: one corpus-collapsing (type, user) hash agg, one
    * moments agg, then a 5-row MDE grid broadcast-exploded onto the
    * type-sized stats relation.
    */
  def power(s: SparkSession, dir: String): DataFrame =
    powerOf(Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100.0).cast("long").as("cents")))

  /** The calculator core over any (event_type, user_id, cents)
    * relation. */
  def powerOf(ev: DataFrame, mdes: Seq[Int] = Seq(1, 2, 5, 10, 20)): DataFrame = {
    val zSumMicro = 1959964L + 841621L // z_{0.975} + z_{0.80}, frozen
    val perUser = ev.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("cents")).as("v"))
    // a relative MDE needs a POSITIVE baseline mean: a type whose
    // per-user sums cancel to ≤ 0 (refund-dominated) has no defined
    // "x% lift", and delta = 0 would divide to ±Inf — which the two
    // engines then cast differently (review finding). Excluded
    // loudly by the same HAVING on both sides.
    val stats = perUser.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"),
        sum(col("v") * col("v")).as("qv"))
      .filter(col("n") >= 2L && col("sv") > 0L)
    val d = (c: String) => col(c).cast("double")
    stats
      .withColumn("mean_c", d("sv") / d("n"))
      .withColumn("var_c2", (d("n") * d("qv") - d("sv") * d("sv")) /
        (d("n") * (d("n") - lit(1.0))))
      .withColumn("mde_pct", explode(lit(mdes.map(_.toLong).toArray)))
      .withColumn("delta_c", col("mean_c") * col("mde_pct").cast("double") / lit(100.0))
      .withColumn("n_required_per_arm",
        ceil(lit(zSumMicro.toDouble / 1.0e6) * lit(zSumMicro.toDouble / 1.0e6)
          * lit(2.0) * col("var_c2") / (col("delta_c") * col("delta_c")))
          .cast("long"))
      .select(col("event_type"), col("mde_pct"), col("n").as("n_users"),
        CrossEngine.rnd4(col("mean_c") / lit(100.0)).as("mean_value"),
        CrossEngine.rnd4(sqrt(col("var_c2")) / lit(100.0)).as("sd_value"),
        col("n_required_per_arm"))
      .orderBy(col("event_type"), col("mde_pct"))
  }

  def ewma(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(col("event_type"),
        floor(col("ts").cast("long") / 86400L).cast("long").as("day_d"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("v_c"))
      .groupBy(col("event_type"), col("day_d"))
      .agg(sum(col("v_c")).as("v_c"))
    val spine = daily0.groupBy(col("event_type"))
      .agg(min(col("day_d")).as("lo"), max(col("day_d")).as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("day_d"))
    val daily = spine.join(daily0, Seq("event_type", "day_d"), "left")
      .select(col("event_type"), col("day_d"), coalesce(col("v_c"), lit(0L)).as("v_c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day_d"))
    // wᵢ = 3^i · 4^(7−i): [16384, 12288, 9216, 6912, 5184, 3888, 2916, 2187]
    val weights = (0 to 7).map(i => (0 until i).foldLeft(1L)((a, _) => a * 3) *
      (0 until 7 - i).foldLeft(1L)((a, _) => a * 4))
    val taps = (0 to 7).map { i =>
      val x = if (i == 0) col("v_c") else lag(col("v_c"), i).over(w)
      (when(x.isNotNull, x * lit(weights(i))).otherwise(lit(0L)),
        when(x.isNotNull, lit(weights(i))).otherwise(lit(0L)))
    }
    daily
      .withColumn("num", taps.map(_._1).reduce(_ + _))
      .withColumn("den", taps.map(_._2).reduce(_ + _))
      .select(col("event_type"),
        (col("day_d") * 86400L).cast("timestamp").as("day_ts"),
        (col("v_c").cast("double") / 100.0).as("v_sum"),
        CrossEngine.rnd4(
          col("num").cast("double") / col("den").cast("double") / 100.0).as("ewma"))
      .orderBy(col("event_type"), col("day_ts"))
  }
}
