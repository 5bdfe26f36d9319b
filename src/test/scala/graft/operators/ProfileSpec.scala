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

  test("kAnonymity matches a driver-side recomputation of the audit") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = graft.Tables.customer(spark, sfDir)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), r.getString(1), math.floor(r.getDouble(2) / 1000.0).toLong))
    val k = 5
    val expected = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
      .groupBy(_._1._1).view.mapValues { classes =>
        val sizes = classes.values.toSeq
        (sizes.length.toLong,
          sizes.count(_ < k).toLong,
          sizes.filter(_ < k).sum,
          sizes.min)
      }.toMap
    val out = Profile.kAnonymity(spark, sfDir, k).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === expected)
    // the audit must actually bite on real data: some class is small
    assert(out.values.exists(_._2 > 0L))
  }

  test("lDiversity matches a driver-side recomputation of the audit") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = graft.Tables.customer(spark, sfDir)
      .select("c_nationkey", "c_mktsegment", "c_acctbal").collect()
      .map(r => (r.getInt(0), math.floor(r.getDouble(2) / 1000.0).toLong, r.getString(1)))
    val l = 3
    val expected = rows.groupBy(t => (t._1, t._2)).view
      .mapValues(ms => (ms.map(_._3).distinct.length.toLong, ms.length.toLong)).toMap
      .groupBy(_._1._1).view.mapValues { classes =>
        val vs = classes.values.toSeq
        (vs.length.toLong,
          vs.count(_._1 < l).toLong,
          vs.filter(_._1 < l).map(_._2).sum,
          vs.map(_._1).min)
      }.toMap
    val out = Profile.lDiversity(spark, sfDir, l).collect()
      .map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === expected)
    // low-diversity classes exist on real data (the audit is not vacuous)
    assert(out.values.exists(_._2 > 0L))
  }

  test("benford: exact digits at decade boundaries, log-uniform passes, uniform flags") {
    import spark.implicits._
    // decade boundaries and near-misses file under the right digit
    val edges = Seq(10.00, 100.00, 1000.00, 99.99, 9.99, 0.01, 0.09, 0.10)
      .toDF("amount")
    val dg = Profile.benfordOf(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // digits: 1,1,1,9,9,1,9,1 → five 1s, three 9s
    assert(dg === Map(1L -> 5L, 9L -> 3L))
    // log-uniform amounts follow Benford: small chi2
    val logu = (0 until 4000)
      .map(i => math.round(math.pow(10.0, 1.0 + 3.0 * i / 4000.0) * 100.0) / 100.0)
      .toDF("amount")
    val chiLog = Profile.benfordOf(logu).head.getDouble(4)
    // uniform amounts violate it: chi2 orders of magnitude larger
    val uni = (0 until 4000).map(i => 10.0 + i * 0.0225).toDF("amount")
    val chiUni = Profile.benfordOf(uni).head.getDouble(4)
    assert(chiLog < 20.0, s"log-uniform chi2 $chiLog")
    assert(chiUni > 50.0 * chiLog, s"uniform chi2 $chiUni vs $chiLog")
  }

  test("benford: billion-dollar amounts file correctly; non-positive rows are excluded") {
    import spark.implicits._
    // above the old 10^8-cents ladder top ($1M) up to the 10^18 rung,
    // plus zero/negative rows that have no first significant digit
    val big = Seq(2.0e6, 3.5e9, 7.0e12, 9.9e15, 0.0, -123.45, -0.01)
      .toDF("amount")
    val dg = Profile.benfordOf(big).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dg === Map(2L -> 1L, 3L -> 1L, 7L -> 1L, 9L -> 1L))
    // no NULL digit group — chi2 stays finite and NULL-free
    assert(Profile.benfordOf(big).filter(col("digit").isNull).count() === 0)
  }

  test("tCloseness: a distribution-skewed class is caught that k-anon and l-diversity both pass") {
    import spark.implicits._
    // three classes in nation 0, 50 rows each, 5 balance bins.
    // 'A' and 'C' mirror the population (10 per bin). 'B' is size-50
    // (passes k=5) and touches all 5 bins (passes l=3), but
    // concentrates 46 of 50 rows in bin 0 — membership alone reveals
    // "almost certainly lowest band". Only t-closeness flags it.
    // (Two classes would NOT do: with one skewed and one uniform
    // class the uniform one mirrors the skew in the global mix and
    // both violate — the extra uniform class anchors the population.)
    val a = (0 until 50).map(i => (0L, "A", (i % 5).toLong))
    val c = (0 until 50).map(i => (0L, "C", (i % 5).toLong))
    val b = (0 until 50).map(i => (0L, "B", if (i < 46) 0L else (1L + i % 4)))
    val cust = (a ++ b ++ c).toDF("c_nationkey", "c_mktsegment", "bal_bucket")
    val out = Profile.tClosenessOf(cust, 200000L).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 3L, "three classes expected")
    assert(r.getLong(2) === 1L, s"exactly class B must violate, got ${r.getLong(2)}")
    assert(r.getLong(3) === 50L, "exposed rows = class B's size")
    // exact-integer replay of class B's EMD: global cum counts over
    // bins 0..4 vs B's, m=5, n=50, N=150
    val bFromData = (0 until 50).map(i => if (i < 46) 0 else (1 + i % 4))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val bArr = (0 to 4).map(j => bFromData.getOrElse(j, 0L)).toArray
    val gArr = (0 to 4).map(j => 20L + bArr(j)).toArray
    val bCum = bArr.scanLeft(0L)(_ + _).tail
    val gCum2 = gArr.scanLeft(0L)(_ + _).tail
    val raw = (0 to 4).map(j => math.abs(bCum(j) * 150L - gCum2(j) * 50L)).sum
    val expected = Math.floorDiv(raw * 1000000L, 4L * 50L * 150L)
    assert(r.getLong(4) === expected, s"max_emd ${r.getLong(4)} != replay $expected")
    assert(expected > 200000L, "planted skew must exceed t=0.2")
    // the sibling audits both PASS class B (k=5, l=3) — t-closeness is
    // the only rung that catches distribution skew
    assert(bArr.sum === 50L && bArr.count(_ > 0L) >= 3)
  }

  test("tCloseness: a single-bin sensitive domain scores EMD 0, not NULL") {
    import spark.implicits._
    // every row lands in bal_bucket 0 → m_bins = 1 and the (m−1)
    // normalizer degenerates; advisory r11: the unguarded DIV made
    // emd NULL, which silently read as non-violating with a NULL max.
    // The correct EMD is 0 (each class trivially equals the global).
    val cust = ((0 until 20).map(i => (0L, "A", 0L)) ++
      (0 until 30).map(i => (0L, "B", 0L)))
      .toDF("c_nationkey", "c_mktsegment", "bal_bucket")
    val out = Profile.tClosenessOf(cust, 200000L).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 2L, "both classes audited")
    assert(r.getLong(2) === 0L, "nothing violates on a 1-bin domain")
    assert(!r.isNullAt(4) && r.getLong(4) === 0L,
      "max_emd must be an explicit 0, never NULL")
  }
}
