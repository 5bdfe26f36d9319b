package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized-Product-Quantization rotation — the parametric OPQ
  * solution (Ge et al., "Optimized Product Quantization", CVPR 2013,
  * §4: for Gaussian data the optimal rotation is PCA followed by
  * balanced eigenvalue allocation across the code blocks). Flat PQ
  * slices the raw coordinate order into blocks, so correlated /
  * unevenly-scaled dimensions land in the same block and waste its
  * code budget; rotating into the PCA basis decorrelates the
  * coordinates, and the allocation step deals the principal
  * directions out so every block quantizes roughly equal variance
  * (balanced log-product, the paper's criterion).
  *
  * Scale shape: the ONLY corpus-sized work is one covariance pass —
  * a double `posexplode` to (i, j, x_i·x_j) upper-triangle terms that
  * partial-aggregates to ≤ dim·(dim+1)/2 rows per map partition
  * before its single exchange, so shuffle volume is
  * O(partitions · dim²), independent of corpus row count. The
  * eigensolve is a driver-side dim×dim Jacobi (dim=64 here — microseconds);
  * the rotation itself is a per-row codegen'd matrix-vector product,
  * a map stage. Everything downstream is the existing PQ pipeline on
  * rotated coordinates; rotation is an isometry, so L2 distances (and
  * therefore ADC shortlists' target ordering) are preserved exactly.
  */
object OpqRotation {

  /** Mean vector and covariance matrix of an `array<float>` column,
    * computed in one aggregation pass: sums of x_i and of the
    * upper-triangle products x_i·x_j keyed by (i, j), mirrored into
    * the full symmetric matrix on the driver. Population covariance
    * (divide by n) — the rotation only needs the eigenbasis, which is
    * scale-invariant.
    */
  def meanCovariance(corpus: DataFrame, vecCol: String,
                     dim: Int): (Array[Double], Array[Array[Double]]) = {
    val flat = corpus
      .agg(graft.functions.MatrixExpressions
        .vecOuterSum(col(vecCol), col(vecCol), dim).as("m"))
      .head().getSeq[Double](0)
    val (n, sx, sxx) =
      graft.functions.MatrixExpressions.decodeMoments(flat, dim)
    require(n > 0, "covariance of an empty corpus")
    val mean = sx.map(_ / n)
    val cov = Array.tabulate(dim, dim)((i, j) => sxx(i)(j) / n - mean(i) * mean(j))
    (mean, cov)
  }

  /** [[meanCovariance]] memoized on content fingerprint + every
    * shape parameter ([[VectorOps.kmeansCentroidsCached]] discipline):
    * the OPQ/BQ family re-derives the identical rotation model per
    * serve, and proving the corpus unchanged is one map-side-partial
    * hash pass vs the full covariance aggregation. dim²+dim doubles
    * per entry — model-scale.
    */
  private val covCache = new scala.collection.concurrent.TrieMap[
    String, (Array[Double], Array[Array[Double]])]
  def meanCovarianceCached(corpus: DataFrame, vecCol: String,
                           dim: Int): (Array[Double], Array[Array[Double]]) = {
    // contentHash fingerprints the (vec_id, vec) columns specifically —
    // a vecCol outside the fingerprint would be a stale-serve hazard
    require(vecCol == "vec", s"cached covariance requires vecCol 'vec', got '$vecCol'")
    val key = VectorIndex.contentHash(corpus) + s"-cov-$vecCol-d$dim"
    if (covCache.size > 64) covCache.clear()
    covCache.getOrElseUpdate(key, meanCovariance(corpus, vecCol, dim))
  }

  /** Eigendecomposition of a symmetric matrix by cyclic Jacobi
    * rotations — deterministic sweep order, fixed convergence
    * threshold, no pivoting heuristics. Returns (eigenvalues,
    * eigenvectors-as-ROWS), unsorted; each eigenvector's sign is
    * normalized so its largest-magnitude component is positive
    * (eigenvector sign is arbitrary, and an unfixed sign would make
    * the learned codebooks run-dependent for no reason).
    */
  def jacobiEigen(sym: Array[Array[Double]],
                  maxSweeps: Int = 64,
                  tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = sym.length
    val a = Array.tabulate(n, n)((i, j) => sym(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0) // rows = vectors
    def offNorm: Double = {
      var s = 0.0
      for (i <- 0 until n; j <- i + 1 until n) s += a(i)(j) * a(i)(j)
      math.sqrt(s)
    }
    var sweep = 0
    while (sweep < maxSweeps && offNorm > tol) {
      for (p <- 0 until n; q <- p + 1 until n if math.abs(a(p)(q)) > tol / (n * n)) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until n) {
          val (akp, akq) = (a(k)(p), a(k)(q))
          a(k)(p) = c * akp - s * akq
          a(k)(q) = s * akp + c * akq
        }
        for (k <- 0 until n) {
          val (apk, aqk) = (a(p)(k), a(q)(k))
          a(p)(k) = c * apk - s * aqk
          a(q)(k) = s * apk + c * aqk
        }
        for (k <- 0 until n) {
          val (vpk, vqk) = (v(p)(k), v(q)(k))
          v(p)(k) = c * vpk - s * vqk
          v(q)(k) = s * vpk + c * vqk
        }
      }
      sweep += 1
    }
    val vals = Array.tabulate(n)(i => a(i)(i))
    for (i <- 0 until n) {
      val m = v(i).indices.maxBy(k => (math.abs(v(i)(k)), -k))
      if (v(i)(m) < 0) for (k <- 0 until n) v(i)(k) = -v(i)(k)
    }
    (vals, v)
  }

  /** Balanced eigenvalue allocation: deal the principal directions
    * (sorted by eigenvalue, descending) into `m` blocks of `dim/m`
    * positions each, always giving the next direction to the
    * non-full block with the smallest accumulated log-variance
    * product — the greedy solution to the paper's balanced-variance
    * criterion. Returns the rotation matrix with rows ordered so
    * output positions [b·subDim, (b+1)·subDim) hold block b's
    * directions: the downstream PQ's contiguous slicing then IS the
    * allocation.
    */
  def allocatedRotation(eigvals: Array[Double], eigvecs: Array[Array[Double]],
                        m: Int): Array[Array[Double]] = {
    val dim = eigvals.length
    val subDim = dim / m
    require(m * subDim == dim, s"dim $dim not divisible into $m blocks")
    val order = eigvals.indices.sortBy(i => (-eigvals(i), i))
    val blocks = Array.fill(m)(List.empty[Int])
    val logVar = new Array[Double](m)
    for (idx <- order) {
      val b = (0 until m)
        .filter(blocks(_).length < subDim)
        .minBy(b => (logVar(b), b))
      blocks(b) = idx :: blocks(b)
      // floor tiny/negative numerical eigenvalues: log of a clamped
      // epsilon keeps the comparison total without -Infinity ties
      logVar(b) += math.log(math.max(eigvals(idx), 1e-12))
    }
    blocks.flatMap(_.reverse.map(eigvecs))
  }

  /** The rotation as a codegen'd per-row expression:
    * out[i] = Σ_j R[i][j] · (x[j] − μ[j]), emitted as `array<float>`
    * so the rotated frame is drop-in for every existing PQ stage
    * (train, encode, LUT). Centering is free fidelity: rotation about
    * the mean is still an isometry of the corpus, and residuals
    * around 0 quantize better than raw coordinates.
    *
    * Delegates to the native [[graft.functions.MatVecCentered]]
    * kernel — the original `transform`/`aggregate` HOF fold evaluated
    * dim² interpreted lambdas per row (HOFs are CodegenFallback);
    * the kernel generates one tight `double[]` loop with the SAME
    * left-to-right double accumulation and per-lane float cast, so
    * results are bitwise-unchanged.
    */
  def rotateExpr(vec: Column, rot: Array[Array[Double]],
                 mean: Array[Double]): Column =
    graft.functions.MatrixExpressions.matVec(vec, rot, mean)

  /** Freeze a trained (mean, rotation) model to the micro grid
    * (r14 — the cross-engine certification recipe): entries become
    * integer micros, and BOTH engines re-derive the working double
    * as `micros / 10⁶` — an exactly-representable-divisor division,
    * so the Scala value and a DuckDB `CAST(k AS BIGINT)/1000000.0`
    * are the same double bit for bit. This is what lets the
    * eigensolve family's POST-rotation pipeline (rotate → sign/code →
    * shortlist → exact re-rank) replay in SQL: the Jacobi solve
    * itself cannot cross engines (iterative, transcendental), but a
    * frozen model is just 64 + 64×64 constants. Quantizing a
    * near-orthogonal rotation to 1e-6 leaves it a fixed linear map —
    * the sign/PQ codes it feeds are hash buckets, not geometry
    * proofs, and the measured recall is unchanged (spec floors).
    */
  def microModel(mean: Array[Double], rot: Array[Array[Double]])
      : (Array[Long], Array[Array[Long]]) =
    (mean.map(x => math.floor(x * 1e6 + 0.5).toLong),
      rot.map(_.map(x => math.floor(x * 1e6 + 0.5).toLong)))

  /** The working doubles of a [[microModel]] — the ONLY way model
    * constants may enter the compute path once frozen. */
  def fromMicros(m: Array[Long]): Array[Double] = m.map(_ / 1e6)
}
