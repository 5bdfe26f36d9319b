package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile computes nulls, distincts and min/max per column in one relation") {
    val df = Seq(
      (Some(1), Some("a")),
      (Some(2), None),
      (Some(2), Some("c")),
      (None, Some("a"))
    ).toDF("num", "str")
    val out = Profile.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(out("num") === ((4L, 1L, 2L, "1", "2")))
    assert(out("str") === ((4L, 1L, 2L, "a", "c")))
  }

  test("profile reads the table twice (plain + distinct passes), never per column") {
    val df = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
    val plan = Profile.profile(df, Seq("l_orderkey", "l_quantity", "l_returnflag"))
      .queryExecution.sparkPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // one scan feeds the plain count/min/max aggregate, one the
    // multi-distinct aggregate — fusing them drags every plain
    // aggregate through the distincts' expand copies (6× slower)
    assert(scans.length === 2, s"expected two scans, got ${scans.length}")
  }

  test("psi drift fires on a planted distribution shift and stays quiet on identity") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // reference ~ U[0,100); comparison shifted to U[50,150) — severe drift
    val shifted = (
      Seq.fill(2000)((rnd.nextDouble() * 100.0, 1L)) ++
      Seq.fill(2000)((50.0 + rnd.nextDouble() * 100.0, 0L))
    ).toDF("value", "is_a")
    val drifted = Profile.psiDrift(shifted).collect()
    assert(drifted.forall(_.getBoolean(5)), "planted shift must flag drift")
    assert(drifted.head.getDouble(4) > 0.25, "severe shift should exceed the retrain bar")
    // identical windows: PSI ~ 0, no flag
    val same = (
      Seq.tabulate(2000)(i => ((i % 100).toDouble, 1L)) ++
      Seq.tabulate(2000)(i => ((i % 100).toDouble, 0L))
    ).toDF("value", "is_a")
    val quiet = Profile.psiDrift(same).collect()
    assert(quiet.forall(!_.getBoolean(5)))
    assert(math.abs(quiet.head.getDouble(4)) < 1e-3)
  }
}
