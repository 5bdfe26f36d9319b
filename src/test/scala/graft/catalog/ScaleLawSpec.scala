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
    // ...and one layer costs one constant upper walk (uh·ue·m per
    // the serve-budget LAW — (3,2,64) below the 65,536-row scale
    // gate, (4,3,128) above it, r13) plus the shrinking top-layer
    // scan. The 10k→80k step CROSSES the gate, so that one delta
    // also carries the law's single budget step-up (~2.4× — the
    // price of holding the measured recall floor, paid once);
    // every later x8 is one constant walk again: explored ∝ log N,
    // nothing polynomial, at both budget tiers.
    val perLayerAbove = 3L * 128 * m // uh·ue·m at the scale tier
    val deltas = budgets.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    deltas.tail.foreach(d => assert(d > 0 && d <= perLayerAbove + 16,
      s"explored delta per x8 must be one constant walk, got $d"))
    // the gate step: bounded by the full stepped budget — one-time,
    // NOT a new growth term (every subsequent delta is flat again)
    assert(deltas.head > 0 && deltas.head <= budgets.head * 3,
      s"gate step must be a bounded one-time step, got ${deltas.head} from ${budgets.head}")
    // fitted growth exponent: on log-log axes a power law explored ∝
    // N^p has slope p = dlog(budget)/dlog(N); for a log-growth curve
    // the slope must collapse toward 0 as N grows — far below even
    // the r9 flat graph's p = 1/2. The head slope carries the gate
    // step, so the monotone-shrink pin starts after it.
    val slopes = sizes.zip(budgets).sliding(2).map {
      case Seq((n1, b1), (n2, b2)) =>
        math.log(b2.toDouble / b1) / math.log(n2.toDouble / n1)
    }.toSeq
    assert(slopes.last < 0.1, s"tail growth exponent ${slopes.last} not log-like")
    assert(slopes.tail == slopes.tail.sorted.reverse, "slope must shrink as N grows")
  }

  test("graph serve-budget law: fixture constants below the gate, one certified step above, knob overrides win") {
    import graft.operators.GraphAnn.{serveBudgetFor, ScaleGateRows}
    // every oracled corpus (≤ 5,970 rows) serves the certified
    // fixture constants — the DuckDB twins replay them literally
    Seq(490L, 1470L, 5970L, ScaleGateRows - 1).foreach(n =>
      assert(serveBudgetFor(n) === ((3, 2, 64)), s"sub-gate budget at $n"))
    // at and above the gate: the ladder-measured stepped budget that
    // holds the recall floor (ARCHITECTURE.md r13 table)
    Seq(ScaleGateRows, 100000L, 400000L, 1600000L, 6400000L,
        1000000000L).foreach(n =>
      assert(serveBudgetFor(n) === ((4, 3, 128)), s"scale budget at $n"))
    // the serve reads the law through graphServeKnob, so a session
    // override still wins (sweep/ops discipline) — and is a genuine
    // override now, not the only way to hold recall
    spark.conf.set("spark.graft.graph.upperEf", "96")
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft-budgetlaw").toString
      val d = new CollectionData(new ChromaSpark(spark, wh))
      assert(d.GraphUpperEf === 96)
    } finally spark.conf.unset("spark.graft.graph.upperEf")
  }

  test("IVF cells follow the sqrt law; probed fraction shrinks as N^(-1/2) below the gate, N^(-1/4) above") {
    val sizes = Seq(10000L, 40000L, 160000L, 640000L, 2560000L)
    val cells = sizes.map(cd.annClustersFor)
    cells.zip(sizes).foreach { case (c, n) =>
      assert(c === math.ceil(math.sqrt(n.toDouble)).toInt) }
    // below the scale gate nprobe is the certified constant 24, so
    // each x4 of corpus doubles the cells and halves the probed
    // fraction (exponent -1/2); above it the r13 law grows nprobe ∝
    // √cells to hold the boundary-query recall floor, so the
    // fraction keeps shrinking at exponent -1/4 — still sublinear,
    // never constant-fraction. The gate-crossing step mixes the two
    // regimes plus the one-time 4/3 coefficient step; it is skipped,
    // like the graph budget's gate step.
    val fracs = cells.map(c => cd.annNprobeFor(c).toDouble / c)
    val slopes = sizes.zip(fracs).sliding(2).map {
      case Seq((n1, f1), (n2, f2)) =>
        math.log(f2 / f1) / math.log(n2.toDouble / n1)
    }.toSeq
    assert(math.abs(slopes.head - (-0.5)) < 0.02,
      s"sub-gate probed-fraction exponent ${slopes.head} != -1/2")
    slopes.drop(2).foreach(s => assert(math.abs(s - (-0.25)) < 0.02,
      s"scale-tier probed-fraction exponent $s != -1/4"))
    // the law itself, pinned at the ladder points (cells = ⌈√N⌉ of
    // 100k/400k/1.6M) and at the certified fixture widths
    assert(CollectionData.nprobeLawFor(78) === 24)
    assert(CollectionData.nprobeLawFor(23) === 23) // tiny: probe all
    assert(CollectionData.nprobeLawFor(317) === 36)
    assert(CollectionData.nprobeLawFor(633) === 51)
    assert(CollectionData.nprobeLawFor(1265) === 72)
  }

  test("kNN-build signature width adapts: expected bucket stays bounded, oracled corpora stay at 6 bits") {
    import graft.operators.GraphAnn.bitsForLayer
    // every oracled corpus (<= 8192 rows) keeps the DuckDB twins'
    // fixed 6-bit derivation
    Seq(490L, 1470L, 5970L, 8192L).foreach(n => assert(bitsForLayer(n) === 6))
    // past that, buckets stay in (32, 128] expected rows — never the
    // r12 cliff where N/2^bits > maxBucket kills every bucket
    Seq(10000L, 20000L, 100000L, 1600000L).foreach { n =>
      val b = bitsForLayer(n)
      val expectedBucket = n.toDouble / math.pow(2.0, b.toDouble)
      assert(expectedBucket <= 128.0 && expectedBucket > 32.0,
        s"n=$n bits=$b bucket=$expectedBucket")
    }
    // past the build-volume gate (~4.2M) the target tightens to
    // (12, 24] and the dense cap drops to ≤ 96, bounding the
    // candidate pair shuffle by 8N·96 at any skew (the 6.4M ladder
    // build materialized > 150 GB of pair traffic at the 64-row
    // target — r13); each node still draws a ~6× candidate
    // oversample for its top-2M edges
    Seq(6400000L, 100000000L, 10000000000L).foreach { n =>
      val b = bitsForLayer(n)
      val expectedBucket = n.toDouble / math.pow(2.0, b.toDouble)
      assert(expectedBucket <= 24.0 && expectedBucket > 12.0,
        s"n=$n bits=$b bucket=$expectedBucket")
      assert(graft.operators.GraphAnn.bucketCapFor(n, 256) === 96)
    }
    assert(graft.operators.GraphAnn.bucketCapFor(1600000L, 256) === 256)
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
