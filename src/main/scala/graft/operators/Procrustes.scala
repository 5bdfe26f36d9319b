package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Orthogonal Procrustes alignment of two embedding spaces — given
  * paired vectors (x, y) of the same entities under two embedders,
  * find the orthogonal map R̂ minimizing Σ‖R̂x − y‖² (Schönemann 1966:
  * R̂ = UVᵀ from the SVD of the cross-covariance M = Σ y xᵀ). This is
  * the standard tool for embedding-model MIGRATION at corpus scale:
  * re-embedding 100 TB under a new model is a full recompute, but if
  * the new space is (approximately) a rotation of the old, aligning
  * with R̂ lets existing indexes, centroids, and codebooks carry over —
  * and the residual distribution measures exactly how non-rotational
  * the model change is.
  *
  * Scale shape, same discipline as [[OpqRotation.meanCovariance]]:
  * the ONLY corpus-sized work is (a) one cross-covariance pass whose
  * shuffle is O(partitions · dim²) — the double posexplode
  * partial-aggregates per map partition before its single exchange —
  * and (b) one residual map-scan. The SVD itself is a driver-side
  * dim×dim solve via the symmetric Jacobi eigensolver on MᵀM
  * (σ = √λ, U = MVΣ⁻¹), microseconds at dim 64. Nothing corpus-sized
  * ever sits on the driver.
  *
  * The driver query PLANTS a known orthogonal map (the deterministic
  * eigenbasis of a fixed symmetric matrix), derives y = Rx on the
  * engine, recovers R̂ from the data alone, and certifies in
  * driver-visible rows: recovery error vs the planted R,
  * orthogonality of R̂, and the per-vector alignment residuals —
  * the same planted-truth honesty contract as the ANN recall columns.
  */
object Procrustes {

  /** Deterministic planted orthogonal map: the (sign-normalized)
    * eigenbasis of a fixed symmetric matrix. No randomness — reruns
    * and both test scales see the identical rotation.
    */
  private[operators] def plantedRotation(dim: Int): Array[Array[Double]] = {
    val sym = Array.tabulate(dim, dim)((i, j) =>
      math.sin(i * dim + j + 1.0) + math.sin(j * dim + i + 1.0))
    OpqRotation.jacobiEigen(sym)._2
  }

  /** Cross-covariance M[i][j] = Σ y[i]·x[j] in ONE aggregation pass
    * (full matrix — M is not symmetric), via the one-buffer
    * [[graft.functions.VecOuterSum]] moment aggregate: the per-row
    * cost is dim² fused multiply-adds in a generated-free while loop
    * and only one `double[1+dim+dim²]` buffer per partition reaches
    * the exchange — no rows·dim² explode. dim² cells collected to the
    * driver: model parameters, not data.
    */
  private[operators] def crossCovariance(pairs: DataFrame, xCol: String,
                                         yCol: String, dim: Int): Array[Array[Double]] = {
    val flat = pairs
      .agg(graft.functions.MatrixExpressions
        .vecOuterSum(col(yCol), col(xCol), dim).as("m"))
      .head().getSeq[Double](0)
    graft.functions.MatrixExpressions.decodeMoments(flat, dim)._3
  }

  /** R̂ = UVᵀ from M's SVD, via the symmetric eigensolve of MᵀM:
    * V = eigenvectors, σ = √λ, U = MVΣ⁻¹. Eigenvector sign flips
    * cancel (u_k and v_k flip together), so the Jacobi solver's sign
    * normalization is harmless. Directions with σ ≈ 0 carry no
    * alignment evidence and are skipped; for full-rank embedding
    * corpora all dim directions survive.
    */
  private[operators] def procrustesSolve(m: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = m.length
    val mtm = Array.tabulate(dim, dim)((i, j) => {
      var s = 0.0
      var k = 0
      while (k < dim) { s += m(k)(i) * m(k)(j); k += 1 }
      s
    })
    val (lambda, v) = OpqRotation.jacobiEigen(mtm)
    val rHat = Array.ofDim[Double](dim, dim)
    for (k <- 0 until dim if lambda(k) > 1e-9) {
      val sigma = math.sqrt(lambda(k))
      // u_k = M v_k / sigma
      val u = Array.tabulate(dim) { i =>
        var s = 0.0
        var j = 0
        while (j < dim) { s += m(i)(j) * v(k)(j); j += 1 }
        s / sigma
      }
      for (i <- 0 until dim; j <- 0 until dim)
        rHat(i)(j) += u(i) * v(k)(j)
    }
    rHat
  }

  /** Driver query: plant R, derive y = Rx over the embeddings corpus,
    * recover R̂ from data, certify. Output rows (metric, value):
    * residuals in 1e-6 units and matrix errors in 1e-9 units so the
    * certification digits are visible on the 1e-4 grid.
    */
  def procrustesQuery(s: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    import s.implicits._
    val zero = new Array[Double](dim)
    val r = plantedRotation(dim)
    val x = Tables.embeddings(s, dir).filter(col("vec_id") >= 10)
      .select(col("vec_id"), col("embedding").as("vec"))
    // y derived on-engine; checkpointed so the dim² rotation is not
    // re-derived by the two downstream consumers (covariance pass +
    // residual scan) — the [[VectorOps.annBq]] staging discipline
    val pairs = x
      .select(col("vec_id"), col("vec"),
        OpqRotation.rotateExpr(col("vec"), r, zero).as("yvec"))
      .localCheckpoint(true)
    // the estimator needs only dim² statistics from any FULL-RANK
    // subset, so the O(rows·dim²) posexplode runs on a deterministic
    // 1-in-4 sample — the residual CERTIFICATION below still scans
    // the full corpus, so a sample-induced misfit could not hide
    val m = crossCovariance(pairs.filter(col("vec_id") % 4 === 0),
      "vec", "yvec", dim)
    val rHat = procrustesSolve(m)
    // driver-side certification scalars: parameter-sized, never data
    var recErr = 0.0
    var orthErr = 0.0
    for (i <- 0 until dim; j <- 0 until dim) {
      recErr = math.max(recErr, math.abs(rHat(i)(j) - r(i)(j)))
      var dot = 0.0
      var k = 0
      while (k < dim) { dot += rHat(i)(k) * rHat(j)(k); k += 1 }
      orthErr = math.max(orthErr, math.abs(dot - (if (i == j) 1.0 else 0.0)))
    }
    // one residual map-scan: ‖R̂x − y‖₂ per vector
    val res = pairs
      .select(VectorOps.l2(
        OpqRotation.rotateExpr(col("vec"), rHat, zero), col("yvec")).as("r"))
      .agg(count(lit(1)).cast("double").as("n"),
        max(col("r")).as("mx"), avg(col("r")).as("mn"))
      .head()
    val r4 = (d: Double) => math.floor(d * 10000.0 + 0.5) / 10000.0
    Seq(
      ("n_vectors", res.getDouble(0)),
      ("max_residual_e6", r4(res.getDouble(1) * 1e6)),
      ("mean_residual_e6", r4(res.getDouble(2) * 1e6)),
      ("rot_recovery_max_err_e9", r4(recErr * 1e9)),
      ("orthogonality_max_err_e9", r4(orthErr * 1e9))
    ).toDF("metric", "value")
  }
}
