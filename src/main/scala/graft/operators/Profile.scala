package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column null counts, exact distinct
  * cardinality, and min/max — the first pass every ingestion pipeline
  * runs over an unknown 100 TB drop before committing compute to it.
  *
  * Plan shape: TWO lean aggregation passes — one for the plain
  * metrics (count/min/max, fully map-side partial), one for the
  * exact distincts (the shared expand + two-phase multi-distinct
  * plan). Keeping them apart matters: fusing plain aggregates into a
  * multi-distinct Aggregate drags every plain aggregate through all
  * the expanded row copies too (measured 6× slower at sf0.1 than the
  * split). The wide one-row results cross-join and unpivot
  * driver-free via `stack` into the long (column, metrics) form. No
  * per-column scans: a 40-column profile reads the table twice, not
  * 40 times.
  */
object Profile {

  /** Long-format profile of `cols` — one output row per column:
    * (col_name, n_rows, n_nulls, n_distinct, min_value, max_value),
    * min/max rendered as strings so heterogeneous column types share
    * one relation.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    val plainAggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        min(col(c)).cast("string").as(s"${c}__mn"),
        max(col(c)).cast("string").as(s"${c}__mx"))
    }
    val distinctAggs = cols.map(c => countDistinct(col(c)).as(s"${c}__nd"))
    val wide = df.agg(count(lit(1)).as("__total"), plainAggs: _*)
      .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
    val stacked = cols.map { c =>
      s"'$c', __total, __total - ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx"
    }.mkString(", ")
    wide.select(expr(
      s"stack(${cols.size}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"))
      .orderBy(col("col_name"))
  }

  /** Driver query: profile the five representative lineitem columns
    * (integer key, two doubles, a flag, a date).
    */
  /** Distribution DRIFT detection via the Population Stability Index
    * — the training-data monitor that flags when a feature's
    * distribution in a new data window has moved from the reference
    * window (PSI > 0.1 ≈ investigate, > 0.25 ≈ retrain). Reference =
    * pre-1998 orders, comparison = the rest; o_totalprice histograms
    * over 10 fixed-width buckets from one global min/max pass (the
    * q34 discipline), Laplace-smoothed so empty buckets stay finite.
    *
    * Cross-engine determinism: each bucket's PSI term is fixed to
    * integer MICRO units before the total is summed — the total is
    * then exact integer math, immune to float summation order (the
    * bm25 integer-micro discipline; `ln` itself is proven
    * engine-identical at micro precision by the bm25 oracle). One
    * scan for bounds + one counting agg into 10 groups — scan-bound
    * at any volume.
    */
  def q39Drift(s: SparkSession, dir: String, buckets: Int = 10,
               threshold: Double = 0.1): DataFrame =
    psiDrift(graft.Tables.orders(s, dir)
      .select(col("o_totalprice").as("value"),
        when(col("o_orderdate") < lit(java.sql.Date.valueOf("1998-01-01")), 1L)
          .otherwise(0L).as("is_a")),
      buckets, threshold)

  /** PSI over a pre-labeled (value, is_a) frame — see [[q39Drift]]. */
  def psiDrift(data: DataFrame, buckets: Int = 10,
               threshold: Double = 0.1): DataFrame = {
    val bounds = data.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val counts = data.crossJoin(broadcast(bounds))
      .select(
        least(floor((col("value") - col("lo")) /
          ((col("hi") - col("lo")) / lit(buckets.toDouble))), lit((buckets - 1).toDouble))
          .cast("long").as("bucket"),
        col("is_a"))
      .groupBy(col("bucket"))
      .agg(sum(col("is_a")).as("n_a"), sum(lit(1L) - col("is_a")).as("n_b"))
    val totals = counts.agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    val p = (col("n_a") + lit(1L)).cast("double") / (col("tot_a") + lit(buckets.toLong)).cast("double")
    val q = (col("n_b") + lit(1L)).cast("double") / (col("tot_b") + lit(buckets.toLong)).cast("double")
    val psiMicro = floor((p - q) * log(p / q) * lit(1000000.0) + lit(0.5)).cast("long")
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    counts.crossJoin(broadcast(totals))
      .withColumn("psi_micro", psiMicro)
      .select(col("bucket"), col("n_a"), col("n_b"),
        (col("psi_micro").cast("double") / lit(1000000.0)).as("psi"),
        (sum(col("psi_micro")).over(all).cast("double") / lit(1000000.0)).as("psi_total"),
        (sum(col("psi_micro")).over(all) > lit((threshold * 1000000).toLong)).as("drift"))
      .orderBy(col("bucket"))
  }

  def profileQuery(s: SparkSession, dir: String): DataFrame =
    profile(
      graft.Tables.lineitem(s, dir)
        .withColumn("l_shipdate", col("l_shipdate").cast("date")),
      Seq("l_orderkey", "l_quantity", "l_discount", "l_returnflag", "l_shipdate"))

  /** k-anonymity audit — the re-identification-risk gate a training
    * corpus carrying user-derived records runs before release: group
    * rows into quasi-identifier equivalence classes (nation ×
    * market segment × coarsened balance bucket) and flag classes
    * with fewer than `k` members, whose rows an adversary can narrow
    * to small candidate sets. Two hash aggregations (rows → classes →
    * per-nation audit), map-side combinable, never wider than the
    * class count — the audit costs one scan at any corpus size.
    * `n_rows_at_risk` is the suppression workload if violating
    * classes are dropped; `min_class_size` is the nation's worst-case
    * anonymity set.
    */
  def kAnonymity(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    graft.Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("class_size") < k, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("class_size") < k, col("class_size")).otherwise(lit(0L)))
          .as("n_rows_at_risk"),
        min(col("class_size")).as("min_class_size"))
      .orderBy(col("c_nationkey"))

  /** Benford first-significant-digit audit — the classic
    * fabricated-data / corruption screen for multiscale positive
    * amounts: natural growth processes put digit d first with
    * probability log₁₀(1+1/d), and systematic deviation (flagged by
    * the χ² statistic carried on every row) marks generated or
    * truncated values. One scan + a 9-group aggregate at any corpus
    * size. The digit comes from an integer CASE ladder over exact
    * cents — never floor(log₁₀(x)), whose 1-ulp wobble at decade
    * boundaries would misfile exact powers of ten differently per
    * engine.
    */
  def benford(s: SparkSession, dir: String): DataFrame =
    benfordOf(graft.Tables.orders(s, dir).select(col("o_totalprice").as("amount")))

  /** The audit itself, over any single-column (amount) relation of
    * 2-decimal values. Non-positive amounts have no first significant
    * digit and are excluded up front (Benford's law speaks only about
    * positive multiscale data — and an engine-dependent NULL-ordering
    * of a null digit group would diverge cross-engine). The ladder
    * covers the FULL long cents range: rungs 10⁰..10¹⁷ plus a top
    * rung for cents ≥ 10¹⁸ (whose ×10 bound would overflow), so a
    * trillion-dollar ledger files correctly instead of falling out of
    * the audit.
    */
  def benfordOf(amounts: DataFrame): DataFrame = {
    val cents = round(col("amount") * 100.0).cast("long")
    val top = 1000000000000000000L // 10^18; max long is 9.22×10^18
    val digit = (17 to 0 by -1).foldLeft(
      when(cents >= top, (cents / top).cast("long")).otherwise(lit(null).cast("long"))
    ) { (acc, k) =>
      val p = math.pow(10, k).toLong
      when(cents >= p && cents < p * 10, (cents / p).cast("long")).otherwise(acc)
    }
    val perDigit = amounts
      .filter(cents >= 1L)
      .select(digit.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_rows"))
    val all = Window.partitionBy()
    perDigit
      .withColumn("n_total", sum(col("n_rows")).over(all))
      .withColumn("exp_p",
        log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double")))
      .withColumn("chi2_term",
        (col("n_rows").cast("double") - col("n_total").cast("double") * col("exp_p"))
          * (col("n_rows").cast("double") - col("n_total").cast("double") * col("exp_p"))
          / (col("n_total").cast("double") * col("exp_p")))
      .select(col("digit"), col("n_rows"),
        CrossEngine.rnd4(col("n_rows").cast("double") / col("n_total").cast("double"))
          .as("observed_p"),
        CrossEngine.rnd4(col("exp_p")).as("benford_p"),
        CrossEngine.rnd4(sum(col("chi2_term")).over(all)).as("chi2_total"))
      .orderBy(col("digit"))
  }

  /** l-diversity — k-anonymity's companion audit: a class whose k
    * members all SHARE the sensitive value still leaks it, so each
    * quasi-identifier class (nation × balance bucket) must carry at
    * least `l` distinct sensitive values (market segment here).
    * Same two-aggregation shape and cost as [[kAnonymity]]; the
    * exact distinct per class is fine because classes are bounded by
    * the sensitive domain, not the corpus.
    */
  def lDiversity(s: SparkSession, dir: String, l: Int = 3): DataFrame =
    graft.Tables.customer(s, dir)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_bucket"))
      .agg(countDistinct(col("c_mktsegment")).as("n_sensitive"),
        count(lit(1)).as("class_size"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n_sensitive") < l, 1L).otherwise(0L)).as("n_low_diversity"),
        sum(when(col("n_sensitive") < l, col("class_size")).otherwise(lit(0L)))
          .as("n_rows_exposed"),
        min(col("n_sensitive")).as("min_diversity"))
      .orderBy(col("c_nationkey"))

  /** t-closeness — the third rung of the re-identification-audit
    * ladder (Li, Li & Venkatasubramanian 2007): [[kAnonymity]] bounds
    * class SIZE, [[lDiversity]] bounds distinct sensitive values, but
    * a class can pass both while its sensitive DISTRIBUTION is so
    * skewed vs the population that membership alone leaks (the
    * "everyone in this class is in the two lowest balance bands"
    * attack). t-closeness bounds the Earth Mover's Distance between
    * each class's sensitive distribution and the global one; for an
    * ORDERED sensitive domain (balance bands here) EMD has the closed
    * form (1/(m−1))·Σ_j |CumP_j − CumQ_j| over the m ordered bins.
    *
    * Quasi-identifiers: nation × market segment (the class an
    * adversary can see); sensitive: the $1000 balance band (ordered,
    * ≤ 11 bins on TPC-H's [-999.99, 9999.99] domain). EXACT integer
    * arithmetic: with class cumulative counts C_j (size n) and global
    * cumulative counts G_j (total N), |CumP_j − CumQ_j| =
    * |C_j·N − G_j·n| / (n·N), so emd_1e6 =
    * ⌊10⁶·Σ_j |C_j·N − G_j·n| / ((m−1)·n·N)⌋ — all BIGINT, floorDiv
    * by the pmod construction, and the j=m term is identically 0
    * (both cumulatives are full mass). Magnitude contract: n·N·(m−1)
    * and 10⁶·Σ must fit signed-64 — holds for N up to ~2³⁰ rows;
    * audit per-partition beyond that.
    *
    * Scale shape: the corpus collapses in the (class × bin) hash agg;
    * the 0-filled class×bin grid, both cumulative windows and the
    * per-class EMD run on bounded frames (#classes·m and m rows —
    * the global cumsum window is a ≤ 11-row frame). Violations
    * aggregate per nation like the sibling audits; `t` defaults to
    * 0.20 (200000 micro).
    */
  def tCloseness(s: SparkSession, dir: String,
                 tMicro: Long = 200000L): DataFrame =
    tClosenessOf(graft.Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_bucket")),
      tMicro)

  /** The audit core over any (c_nationkey, c_mktsegment, bal_bucket)
    * relation — split out so specs can drive it with planted skew. */
  def tClosenessOf(cust: DataFrame, tMicro: Long): DataFrame = {
    // global ordered-bin distribution: bounded by the bin domain
    val globalBins = cust.groupBy(col("bal_bucket"))
      .agg(count(lit(1)).as("g"))
      .withColumn("cum_g", sum(col("g")).over(
        Window.partitionBy().orderBy(col("bal_bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_total", sum(col("g")).over(Window.partitionBy()))
      .withColumn("m_bins", count(lit(1)).over(Window.partitionBy()))
      .select(col("bal_bucket"), col("cum_g"), col("n_total"), col("m_bins"))
    // per-class bin counts, 0-filled onto the full bin grid so the
    // class cumulative is defined at every global bin boundary
    val classBins = cust
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(count(lit(1)).as("c"))
    val classes = classBins
      .select(col("c_nationkey"), col("c_mktsegment")).distinct()
    val grid = classes.join(broadcast(globalBins.select(col("bal_bucket"))))
      .join(classBins, Seq("c_nationkey", "c_mktsegment", "bal_bucket"), "left")
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wClass = Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("bal_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val emd = grid
      .withColumn("cum_c", sum(col("c")).over(wClass))
      .withColumn("class_size", sum(col("c")).over(
        Window.partitionBy(col("c_nationkey"), col("c_mktsegment"))))
      .join(broadcast(globalBins), "bal_bucket")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(min(col("class_size")).as("class_size"),
        sum(abs(col("cum_c") * col("n_total") - col("cum_g") * col("class_size")))
          .as("raw"),
        min(col("n_total")).as("n_total"), min(col("m_bins")).as("m_bins"))
    // m_bins = 1 ⇒ every class trivially matches the global
    // distribution (one bin carries full mass on both sides), but the
    // (m−1) normalizer degenerates to a 0 denominator and the DIV
    // would yield NULL — which then compares false against tMicro and
    // silently reads as "non-violating" with a NULL max. Pin the
    // mathematically-correct EMD = 0 explicitly.
    emd
      .withColumn("emd_1e6", expr(
        """CASE WHEN m_bins > 1L THEN
          |  (raw * 1000000L -
          |    pmod(raw * 1000000L, (m_bins - 1L) * class_size * n_total))
          |   DIV ((m_bins - 1L) * class_size * n_total)
          |ELSE 0L END""".stripMargin))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("emd_1e6") > tMicro, 1L).otherwise(0L)).as("n_violating"),
        sum(when(col("emd_1e6") > tMicro, col("class_size")).otherwise(lit(0L)))
          .as("n_rows_exposed"),
        max(col("emd_1e6")).as("max_emd_1e6"))
      .orderBy(col("c_nationkey"))
  }
}
