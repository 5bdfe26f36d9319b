package graft.operators

import graft.SparkSpec

/** Value-level verification of the approximate-query-processing
  * operator: the whole estimate/SE pipeline is recomputed driver-side
  * from raw rows, and the design-based statistics must certify
  * themselves on real data.
  */
class SampledAggSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def bucket(orderkey: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(orderkey.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 4)
    java.lang.Long.parseLong(hex, 16) % 100
  }

  test("q49SampledAgg matches a from-scratch Horvitz–Thompson recomputation") {
    val rows = graft.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_orderkey", "l_quantity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2).toLong))
    val f = 0.1
    val expected = rows.groupBy(_._1).map { case (flag, rs) =>
      val trueQty = rs.map(_._3).sum
      val clusters = rs.filter(t => bucket(t._2) < 10)
        .groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
      val n = clusters.size.toLong
      val s = clusters.values.sum
      val ss = clusters.values.map(t => t * t).sum
      val est = s.toDouble * (1.0 / f)
      val se = math.sqrt(((1.0 - f) / (f * f)) * ss.toDouble)
      def rnd4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
      flag -> (n, s * 10, trueQty, rnd4(se),
        rnd4((est - trueQty) * 100.0 / trueQty),
        math.abs(est - trueQty) <= 2.0 * se)
    }
    val out = Relational.q49SampledAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getBoolean(6))).toMap
    assert(out === expected)
    // the design-based SE must certify its own estimate on real data
    assert(out.values.forall(_._6), "every flag inside its 2σ band")
    // and the claimed precision is itself useful: SE under a quarter
    // of the true total even at this tiny SF (tightens as 1/√n)
    assert(out.values.forall(v => v._4 < 0.25 * v._3))
  }

  test("q54Trimmed matches a from-scratch percentile/trim/winsorize recomputation") {
    val rows = graft.Tables.orders(spark, sfDir)
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    // linear-interpolation quantile, the percentile/quantile_cont formula
    def q(sorted: Array[Double], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = math.floor(pos).toInt; val hi = math.ceil(pos).toInt
      sorted(lo) + (pos - lo) * (sorted(hi) - sorted(lo))
    }
    def r2(x: Double) = math.floor(x * 100.0 + 0.5) / 100.0
    val expected = rows.groupBy(_._1).map { case (g, vs0) =>
      val vs = vs0.map(_._2)
      val sorted = vs.sorted
      val (lo, hi) = (q(sorted, 0.1), q(sorted, 0.9))
      val kept = vs.filter(v => v >= lo && v <= hi)
      g -> (vs.length.toLong, r2(vs.sum / vs.length), kept.length.toLong,
        r2(kept.sum / kept.length),
        r2(vs.map(v => math.max(lo, math.min(hi, v))).sum / vs.length))
    }
    val out = Relational.q54Trimmed(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out === expected)
    // the trim must drop ~20% of each group (the audit is not vacuous)
    assert(out.values.forall { case (n, _, kept, _, _) =>
      kept < n && kept >= (0.75 * n).toLong })
  }
}
