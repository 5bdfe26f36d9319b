package graft.operators

import graft.SparkSpec
import graft.functions.KmvSketch
import org.apache.spark.sql.functions._

class DistinctSketchSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("KMV sketch is exactly the k smallest distinct hashes") {
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L, 6L)
    val out = vals.toDF("h").agg(KmvSketch(col("h"), 4).as("sk"))
      .head().getSeq[Long](0)
    assert(out === Seq(1L, 2L, 3L, 5L))
  }

  test("sketch below capacity is the full distinct set, ascending") {
    val out = Seq(5L, 5L, 2L, 9L).toDF("h")
      .agg(KmvSketch(col("h"), 100).as("sk")).head().getSeq[Long](0)
    assert(out === Seq(2L, 5L, 9L))
  }

  test("sketch is invariant to partitioning and merge order") {
    val df = (1 to 5000).map(i => (i * 2654435761L) % 1000003L).toDF("h")
    val one = df.repartition(1).agg(KmvSketch(col("h"), 64)).head().getSeq[Long](0)
    val many = df.repartition(13).agg(KmvSketch(col("h"), 64)).head().getSeq[Long](0)
    assert(one === many)
    assert(one.size === 64 && one === one.sorted)
  }

  test("planted 50% overlap is recovered by the sketch estimator") {
    // two "sources" sharing exactly half their elements
    val a = (0 until 4000).map(i => ("a", s"tok$i"))
    val b = (2000 until 6000).map(i => ("b", s"tok$i"))
    val docs = (a ++ b).groupBy(_._1).toSeq.map { case (src, toks) =>
      (src, toks.map(_._2).mkString(" "))
    }.toDF("source", "text")
    val out = DistinctSketch.vocabOverlap(docs, k = 256).head()
    val jEst = out.getAs[Double]("jaccard_est")
    val jExact = out.getAs[Double]("jaccard_exact")
    assert(math.abs(jExact - 1.0 / 3.0) < 0.01) // 2000 / 6000
    assert(math.abs(jEst - jExact) < 0.12, s"jaccard_est $jEst vs $jExact")
    val iEst = out.getAs[Double]("inter_est")
    val iExact = out.getAs[Long]("exact_inter")
    assert(math.abs(iEst - iExact) / iExact < 0.35,
      s"inter_est $iEst vs exact $iExact")
  }

  test("driver query: 190 source pairs, estimates certified in-row") {
    val out = DistinctSketch.vocabOverlapQuery(spark, sfDir).collect()
    assert(out.length === 190) // C(20, 2)
    out.foreach { r =>
      val k = r.getAs[Long]("k_combined")
      assert(k >= 1 && k <= 256)
      val j = r.getAs[Double]("jaccard_est")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("exact_union") >= r.getAs[Long]("exact_inter"))
    }
    // sources of the same corpus genuinely share vocabulary: the
    // estimator must SEE that, not report zeros
    assert(out.count(_.getAs[Double]("jaccard_est") > 0.0) > 150)
    // and the median relative error of the intersection estimate is
    // bounded — the honesty columns would expose a broken estimator
    val errs = out.map(_.getAs[Double]("inter_rel_err")).sorted
    assert(errs(errs.length / 2) < 0.5, s"median rel err ${errs(errs.length / 2)}")
  }
}
