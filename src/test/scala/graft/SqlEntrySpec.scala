package graft

import org.apache.spark.sql.functions.col

/** The SQL entry point: ANSI-portable members of `oracleSql` run
  * VERBATIM under `spark.sql` against registered table views and
  * return exactly what the DataFrame formulation returns — the same
  * text drives three engines (Spark DataFrame, Spark SQL, DuckDB).
  * Dialect-specific oracles (DuckDB list/regex builtins) are out of
  * scope by design; this pins the portable core.
  */
class SqlEntrySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val portable = Seq(
    "q1_pricing_summary", "q6_anti_join", "q5_semi_join",
    "ev_hourly", "q10_sort_limit", "q14_where_filter")

  test("portable oracle SQL runs verbatim on spark.sql and matches the DataFrame plan") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings"))
      Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    portable.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaDf = SparkEntry.queries(name)(spark, sfDir)
      assert(viaSql.columns.toSeq === viaDf.columns.toSeq, s"$name: column mismatch")
      val a = viaSql.collect().map(_.toSeq).toSeq
      val b = viaDf.collect().map(_.toSeq).toSeq
      assert(a === b, s"$name: spark.sql result diverged from the DataFrame plan")
    }
  }
}
