package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the GROWTH LAWS the 100-TB design claims (r12 — the scale
  * audit's formula half; the empirical half is the TuneScale record
  * table in ARCHITECTURE.md, measured to 1.6M rows):
  *
  *  - graph explored-rows budget grows ∝ log N at constant ef,
  *  - IVF cell count ∝ √N, so the probed fraction at constant
  *    nprobe ∝ N^(−1/2),
  *  - the kNN-build signature width adapts so the expected LSH
  *    bucket stays ~64 rows — without it every bucket trips the
  *    dense-skip past 64·maxBucket rows and the base graph silently
  *    degenerates to the ring (the r12 scale-audit cliff).
  */
class ScaleLawSpec extends SparkSpec {

  private lazy val cd = {
    val wh = java.nio.file.Files.createTempDirectory("graft-scalelaw").toString
    new CollectionData(new ChromaSpark(spark, wh))
  }

  test("graph explored budget grows logarithmically: +one constant walk per 8x of corpus") {
    val m = 8
    val sizes = Seq(10000L, 80000L, 640000L, 5120000L, 40960000L)
    val budgets = sizes.map(n => cd.graphExploredBudget(m, n, 10))
    // each x8 adds exactly one layer...
    val levels = sizes.map(n => cd.graphMaxLevelFor(m, n))
    assert(levels === Seq(4, 5, 6, 7, 8))
    // ...and one layer costs one constant upper walk (uh*ue*m = 1024
    // at the serve defaults) plus the shrinking top-layer scan — the
    // budget DELTA per x8 is bounded by that constant, i.e. explored
    // ∝ log N, nothing polynomial
    val deltas = budgets.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    deltas.foreach(d => assert(d > 0 && d <= 2L * 64 * m + 16,
      s"explored delta per x8 must be one constant walk, got $d"))
    // fitted growth exponent: on log-log axes a power law explored ∝
    // N^p has slope p = dlog(budget)/dlog(N); for a log-growth curve
    // the slope must collapse toward 0 as N grows — far below even
    // the r9 flat graph's p = 1/2
    val slopes = sizes.zip(budgets).sliding(2).map {
      case Seq((n1, b1), (n2, b2)) =>
        math.log(b2.toDouble / b1) / math.log(n2.toDouble / n1)
    }.toSeq
    assert(slopes.last < 0.1, s"tail growth exponent ${slopes.last} not log-like")
    assert(slopes == slopes.sorted.reverse, "slope must shrink as N grows")
  }

  test("IVF cells follow the sqrt law: probed fraction at constant nprobe shrinks as N^(-1/2)") {
    val sizes = Seq(10000L, 40000L, 160000L, 640000L, 2560000L)
    val cells = sizes.map(cd.annClustersFor)
    cells.zip(sizes).foreach { case (c, n) =>
      assert(c === math.ceil(math.sqrt(n.toDouble)).toInt) }
    // each x4 of corpus doubles the cells → halves the probed
    // fraction: the fitted exponent of probedFrac vs N is -1/2
    val fracs = cells.map(c => cd.annNprobeFor(c).toDouble / c)
    val slopes = sizes.zip(fracs).sliding(2).map {
      case Seq((n1, f1), (n2, f2)) =>
        math.log(f2 / f1) / math.log(n2.toDouble / n1)
    }.toSeq
    slopes.foreach(s => assert(math.abs(s - (-0.5)) < 0.02,
      s"probed-fraction exponent $s != -1/2"))
  }

  test("kNN-build signature width adapts: expected bucket stays bounded, oracled corpora stay at 6 bits") {
    import graft.operators.GraphAnn.bitsForLayer
    // every oracled corpus (<= 8192 rows) keeps the DuckDB twins'
    // fixed 6-bit derivation
    Seq(490L, 1470L, 5970L, 8192L).foreach(n => assert(bitsForLayer(n) === 6))
    // past that, buckets stay in [64, 128) expected rows — never the
    // r12 cliff where N/2^bits > maxBucket kills every bucket
    Seq(10000L, 20000L, 100000L, 1600000L, 100000000L, 10000000000L).foreach { n =>
      val b = bitsForLayer(n)
      val expectedBucket = n.toDouble / math.pow(2.0, b.toDouble)
      assert(expectedBucket <= 128.0 && expectedBucket > 32.0,
        s"n=$n bits=$b bucket=$expectedBucket")
    }
  }

  test("past the old cliff the kNN stage still yields metric edges, not just the ring") {
    import org.apache.spark.sql.functions.{col => cc, countDistinct}
    // 80k direction-uniform rows (5x past 64*256, the fixed-width
    // cliff): with the old 6-bit signatures the expected bucket holds
    // ~1,250 rows >> maxBucket 256, the dense-skip swallows most buckets and
    // a large share of nodes lose EVERY metric neighbor; adaptive
    // width must give every node a kNN edge. centers = n makes each
    // vector its own center (no cluster skew sheltering buckets
    // under the cap); dim 8 keeps the spec cheap — the law under
    // test is bucket arithmetic, not geometry.
    val n = 80000L
    val corpus = graft.TuneScale.vectors(spark, 0L, n, 8, n.toInt)
      .select(cc("vec_id"), cc("embedding").as("vec")).localCheckpoint(true)
    val dist = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      graft.operators.VectorOps.l2(a, b)
    // kNN stage only (no ring): distinct sources = nodes that kept
    // at least one metric neighbor
    def coveredNodes(bits: Int): Long = graft.operators.GraphAnn
      .buildKnnGraphDist(corpus, 4, dist, dim = 8, bitsPerTable = bits,
        strides = Seq.empty)
      .agg(countDistinct(cc("src"))).head().getLong(0)
    val fixed = coveredNodes(6)
    val adaptive = coveredNodes(graft.operators.GraphAnn.bitsForLayer(n))
    // hyperplane sign patterns are not equiprobable, so a few tail
    // buckets still trip the cap under the adaptive width — coverage
    // must stay essentially total (ring links carry the stragglers)
    assert(adaptive >= n - n / 100,
      s"adaptive width must cover ~every node: $adaptive of $n")
    assert(fixed < n / 2,
      s"fixed 6-bit width 5x past the cliff should orphan most nodes, kept $fixed")
  }
}
