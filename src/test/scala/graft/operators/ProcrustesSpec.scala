package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProcrustesSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("planted rotation is orthonormal") {
    val r = Procrustes.plantedRotation(8)
    for (i <- 0 until 8; j <- 0 until 8) {
      val dot = (0 until 8).map(k => r(i)(k) * r(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-10)
    }
    // and not trivially the identity — it genuinely mixes coordinates
    assert((0 until 8).exists(i => math.abs(r(i)(i)) < 0.9))
  }

  test("procrustesSolve recovers a known rotation from its cross-covariance") {
    val dim = 6
    val r = Procrustes.plantedRotation(dim)
    // exact synthetic M = R · S with S an SPD matrix (diag + jitter)
    val s0 = Array.tabulate(dim, dim)((i, j) =>
      (if (i == j) 3.0 + i else 0.0) + 0.1 * math.sin(i + 2.0 * j))
    val sym = Array.tabulate(dim, dim)((i, j) => (s0(i)(j) + s0(j)(i)) / 2.0)
    val m = Array.tabulate(dim, dim)((i, j) =>
      (0 until dim).map(k => r(i)(k) * sym(k)(j)).sum)
    val rHat = Procrustes.procrustesSolve(m)
    for (i <- 0 until dim; j <- 0 until dim)
      assert(math.abs(rHat(i)(j) - r(i)(j)) < 1e-8,
        s"entry ($i,$j): ${rHat(i)(j)} vs ${r(i)(j)}")
  }

  test("end-to-end alignment certifies near-zero recovery and residual errors") {
    val out = Procrustes.procrustesQuery(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("n_vectors") > 0)
    // residuals are float32-storage noise only: well under 100 µ-units
    assert(out("max_residual_e6") < 100.0, s"max residual ${out("max_residual_e6")}e-6")
    // recovered matrix matches the planted one to ~1e-6 (e9-scaled < 1000)
    assert(out("rot_recovery_max_err_e9") < 1000.0)
    assert(out("orthogonality_max_err_e9") < 1000.0)
  }
}
