package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native matrix kernels for the rotation-based vector paths
  * ([[graft.operators.OpqRotation]], [[graft.operators.Procrustes]]).
  *
  * Two hot spots motivated these:
  *
  *  1. The dim×dim rotation `out[i] = Σ_j R[i][j]·(x[j] − μ[j])` was a
  *     `transform`/`aggregate` higher-order-function fold — HOFs are
  *     CodegenFallback, so every one of the dim² element reads boxed
  *     through the interpreter with two `element_at` lookups. At
  *     dim 64 that is 4096 interpreted lambda evaluations PER ROW on
  *     the corpus scan. [[MatVecCentered]] generates one tight
  *     `double[]` loop instead; the rotation matrix rides along as a
  *     codegen reference object, not a 4096-element array literal.
  *
  *  2. The covariance / cross-covariance passes materialized
  *     rows·dim² (or rows·dim²/2) exploded (i, j, x_i·x_j) tuples
  *     through a hash aggregate. The shuffle was already
  *     O(partitions·dim²), but the map-side row blow-up is pure
  *     InternalRow overhead: at 2B corpus rows × dim 64 that is
  *     ~4×10¹² intermediate rows. [[VecOuterSum]] is a
  *     [[TypedImperativeAggregate]] whose buffer is ONE
  *     `double[1 + dim + dim²]` — count, Σx, and the full Σ y·xᵀ —
  *     updated with a two-level while loop and merged cell-wise, so
  *     the per-row cost is dim² fused multiply-adds and nothing
  *     row-shaped ever amplifies. Same single-exchange plan shape,
  *     ~10× less map CPU, and it serves BOTH the symmetric
  *     (y = x, covariance) and asymmetric (Procrustes Σ y·xᵀ) cases.
  *
  * Float contract: [[MatVecCentered]] accumulates left-to-right in
  * double and casts each output lane to float — bitwise-identical to
  * the HOF formulation it replaces, so swapping implementations
  * cannot move any oracle-checked value. [[VecOuterSum]] re-orders
  * the additions (per-partition running sums instead of per-key
  * shuffled sums), which perturbs the covariance in the last ulp;
  * every consumer is either an eigenbasis (scale/ulp-stable by the
  * Jacobi solver's tolerance) or a bound-asserted certification
  * column, never a hash-compared oracle value.
  */
case class MatVecCentered(child: Expression, rot: Array[Double],
                          mean: Array[Double])
    extends UnaryExpression with Serializable {

  private val dim = mean.length
  require(rot.length == dim * dim,
    s"rotation has ${rot.length} cells, need dim²=${dim * dim}")

  override def prettyName: String = "graft_matvec"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // wrong-dimension input → NULL row, matching the HOF's null fold
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${other.simpleString(10)}")
  }

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != dim) null
    else {
      val dbl = isDouble
      val centered = new Array[Double](dim)
      var j = 0
      while (j < dim) {
        val xj = if (dbl) x.getDouble(j) else x.getFloat(j).toDouble
        centered(j) = xj - mean(j)
        j += 1
      }
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        var acc = 0.0
        val base = i * dim
        j = 0
        while (j < dim) { acc += rot(base + j) * centered(j); j += 1 }
        out(i) = acc.toFloat
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val rotRef = ctx.addReferenceObj("rot", rot, "double[]")
      val meanRef = ctx.addReferenceObj("mean", mean, "double[]")
      val cen = ctx.freshName("centered")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val getX =
        if (isDouble) s"$a.getDouble($j)" else s"(double) $a.getFloat($j)"
      s"""
         |if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $cen = new double[$dim];
         |  for (int $j = 0; $j < $dim; $j++) {
         |    $cen[$j] = $getX - $meanRef[$j];
         |  }
         |  float[] $out = new float[$dim];
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double $acc = 0.0;
         |    int base = $i * $dim;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $acc += $rotRef[base + $j] * $cen[$j];
         |    }
         |    $out[$i] = (float) $acc;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `VecOuterSum(y, x, dim)` — one-pass moment aggregate over two
  * vector columns. Buffer layout (row-major, `double[1 + dim + dim²]`):
  * `[0]` row count, `[1 .. dim]` Σ x[j], `[1 + dim + i·dim + j]`
  * Σ y[i]·x[j]. Merge is cell-wise addition; only `8·(1+dim+dim²)`
  * bytes of state per partition ever cross the exchange. With
  * `y = x` the tail block is the raw second-moment matrix Σ x·xᵀ
  * (covariance after the driver subtracts μμᵀ); with distinct inputs
  * it is the Procrustes cross-covariance Σ y·xᵀ.
  */
case class VecOuterSum(yCol: Expression, xCol: Expression, dim: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(dim >= 1 && dim <= 1024, s"dim out of range: $dim")

  private val size = 1 + dim + dim * dim

  override def children: Seq[Expression] = Seq(yCol, xCol)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_vec_outer_sum"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(yCol.dataType) && ok(xCol.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double> inputs, got " +
        s"${yCol.dataType.simpleString} / ${xCol.dataType.simpleString}")
  }

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def createAggregationBuffer(): Array[Double] = new Array[Double](size)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val yv = yCol.eval(input)
    val xv = xCol.eval(input)
    if (yv != null && xv != null) {
      val y = yv.asInstanceOf[ArrayData]
      val x = xv.asInstanceOf[ArrayData]
      // a wrong-dimension vector is corrupt input, not a skippable row:
      // silently dropping it would bias the moments it certifies
      require(y.numElements() == dim && x.numElements() == dim,
        s"$prettyName(dim=$dim) saw vectors of ${y.numElements()}/${x.numElements()}")
      val (yd, xd) = (isDouble(yCol), isDouble(xCol))
      val xs = new Array[Double](dim)
      var j = 0
      while (j < dim) {
        xs(j) = if (xd) x.getDouble(j) else x.getFloat(j).toDouble
        buf(1 + j) += xs(j)
        j += 1
      }
      buf(0) += 1.0
      var i = 0
      while (i < dim) {
        val yi = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
        val base = 1 + dim + i * dim
        j = 0
        while (j < dim) { buf(base + j) += yi * xs(j); j += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * size)
    var i = 0
    while (i < size) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(size)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(n: Int): VecOuterSum =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecOuterSum =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecOuterSum =
    copy(yCol = c(0), xCol = c(1))
}

object MatrixExpressions {

  /** `R·(x − μ)` as `array<float>` — drop-in for the HOF rotation. */
  def matVec(vec: Column, rot: Array[Array[Double]],
             mean: Array[Double]): Column =
    GraftSqlBridge.column(
      MatVecCentered(GraftSqlBridge.expression(vec), rot.flatten, mean))

  /** One-pass `(n, Σx, Σ y·xᵀ)` moments as one flat `array<double>`. */
  def vecOuterSum(y: Column, x: Column, dim: Int): Column =
    GraftSqlBridge.column(
      VecOuterSum(GraftSqlBridge.expression(y), GraftSqlBridge.expression(x), dim)
        .toAggregateExpression())

  /** Decode [[vecOuterSum]]'s buffer: (n, Σx, Σ y·xᵀ as dim×dim). */
  def decodeMoments(flat: Seq[Double], dim: Int): (Double, Array[Double], Array[Array[Double]]) = {
    val n = flat(0)
    val sx = Array.tabulate(dim)(j => flat(1 + j))
    val syx = Array.tabulate(dim, dim)((i, j) => flat(1 + dim + i * dim + j))
    (n, sx, syx)
  }
}
