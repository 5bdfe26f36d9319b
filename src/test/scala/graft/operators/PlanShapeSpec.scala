package graft.operators

import graft.SparkSpec

/** Plan-shape regression pins for the scale-critical choices in the
  * round-4 operators: the property that matters at 100 TB is not the
  * local runtime but WHICH plan Spark builds — these specs fail if a
  * refactor silently reintroduces the shuffle/skew shapes the
  * operators were designed away from.
  */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sparkPlanOf(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan

  test("pagerank never plans a sort-merge join: vertex state broadcasts") {
    val plan = sparkPlanOf(Graph.pagerank(spark, sf)).toString
    assert(plan.contains("BroadcastHashJoin"),
      "expected the rank vector on the broadcast side")
    assert(!plan.contains("SortMergeJoin"),
      "edge list must never be reshuffled for a join")
  }

  test("sentence dedup pre-aggregates first-occurrence (no window over spans)") {
    val plan = sparkPlanOf(
      TextAnalysis.sentenceDedup(spark, sf))
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "first-occurrence must be a combinable aggregate, not a window (AQE can't split a skewed window partition)")
    // the min(struct) agg must have a partial (map-side) phase — it
    // plans as SortAggregate (struct min isn't hash-aggregable), but
    // the partial/final split is what makes a hot span combinable
    val partials = plan.toString.linesIterator.filter(_.contains("partial_min"))
    assert(partials.nonEmpty, "expected a partial min(struct) aggregation phase")
  }

  test("integrity audit scans each child relation once per edge (no count+anti double scan)") {
    val plan = sparkPlanOf(Relational.qIntegrity(spark, sf))
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // 7 edges × (1 child scan + 1 parent scan) = 14 file scans
    assert(scans.length === 14, s"expected 14 scans, got ${scans.length}")
  }

  test("histogram shuffles only the bucket relation after the bounds pass") {
    val plan = sparkPlanOf(Relational.q34Histogram(spark, sf))
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // one scan for min/max bounds, one for bucket assignment
    assert(scans.length === 2, s"expected 2 scans, got ${scans.length}")
  }

  test("mixture sampling broadcasts the per-domain thresholds") {
    val plan = sparkPlanOf(TextAnalysis.mixtureSample(spark, sf)).toString
    assert(plan.contains("BroadcastHashJoin"),
      "threshold join must broadcast the tiny per-domain relation")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("expectations audit is conditional aggregates, not one scan per expectation") {
    val plan = sparkPlanOf(Relational.q37Expectations(spark, sf))
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // lineitem agg + orders agg + referential (lineitem + orders) +
    // n_checked recount = 5 scans for 5 expectations; adding a
    // non-referential expectation must NOT add a scan
    assert(scans.length === 5, s"expected 5 scans, got ${scans.length}")
  }

  test("range search plans no shuffle after the scan (pure broadcast filter)") {
    val plan = sparkPlanOf(HybridSearch.rangeSearch(spark, sf))
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    // the only exchange allowed is the final ORDER BY range partition
    assert(exchanges.length <= 1,
      s"radius search must not shuffle the corpus: ${exchanges.length} exchanges")
    assert(plan.toString.contains("BroadcastNestedLoopJoin") ||
      plan.toString.contains("BroadcastExchange"),
      "queries must broadcast")
  }

  test("triangle core restriction joins are broadcasts, not shuffles of the edge list") {
    val plan = sparkPlanOf(Graph.triangles(spark, sf, topNodes = 50)).toString
    assert(plan.contains("BroadcastHashJoin"),
      "top-node restriction must broadcast the tiny core set")
  }

  test("sq8 scoring carries only codes + scalars through the shortlist stage") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 5)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("qvec"))
    val c = emb.filter(org.apache.spark.sql.functions.col("vec_id") >= 5)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding").as("vec"))
    val plan = sparkPlanOf(VectorOps.annSq(q, c, k = 5, release = false)).toString
    assert(plan.contains("graft_int8_dot"),
      "scoring must run the codegen'd Int8Dot kernel, not the HOF fold")
  }
}
