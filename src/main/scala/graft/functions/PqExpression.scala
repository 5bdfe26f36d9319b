package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Codegen'd product-quantization encoder: for each of `m` blocks,
  * the index of the nearest codeword (squared euclidean, ties to the
  * lower code) — one compiled triple loop per vector instead of the
  * m × k interpreted `aggregate` folds of the HOF formulation, whose
  * per-element lambda frames dominate the PQ index build.
  *
  * Bitwise parity with the HOF chain: per-block distances accumulate
  * (x−w)² left-to-right in double over the same flat codebook layout
  * [block][codeword][dim], and a strict `<` comparison keeps the
  * lowest code on exact distance ties — identical to the HOF's
  * struct-sort on (d, c). Proven in VectorOpsSpec.
  */
case class PqEncode(child: Expression, codebook: Seq[Double],
                    m: Int, kCodes: Int, subDim: Int)
    extends UnaryExpression with Serializable {

  require(codebook.length == m * kCodes * subDim,
    s"codebook length ${codebook.length} != $m*$kCodes*$subDim")

  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${other.simpleString(10)}")
  }

  private def isDoubleIn: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  @transient private lazy val flat: Array[Double] = codebook.toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    require(x.numElements() == m * subDim,
      s"$prettyName: vector has ${x.numElements()} dims, codebook expects ${m * subDim}")
    val dbl = isDoubleIn
    val codes = new Array[Int](m)
    var b = 0
    while (b < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < kCodes) {
        val off = (b * kCodes + c) * subDim
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val xv = if (dbl) x.getDouble(b * subDim + i) else x.getFloat(b * subDim + i).toDouble
          val diff = xv - flat(off + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(b) = best
      b += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    val getX =
      if (isDoubleIn) (a: String, i: String) => s"$a.getDouble($i)"
      else (a: String, i: String) => s"(double) $a.getFloat($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val diff = ctx.freshName("diff")
      s"""
         |if ($a.numElements() != ${m * subDim}) {
         |  throw new IllegalArgumentException(
         |    "graft_pq_encode: vector has " + $a.numElements() + " dims, codebook expects ${m * subDim}");
         |}
         |int[] $codes = new int[$m];
         |for (int $b = 0; $b < $m; $b++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $kCodes; $c++) {
         |    int $off = ($b * $kCodes + $c) * $subDim;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $diff = ${getX(a, s"$b * $subDim + $i")} - $cbRef[$off + $i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$b] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(vec: Column, codebook: Seq[Double], m: Int, kCodes: Int, subDim: Int): Column =
    GraftSqlBridge.column(PqEncode(GraftSqlBridge.expression(vec), codebook, m, kCodes, subDim))
}

/** Codegen'd ADC (asymmetric distance computation) score: Σ_b
  * lut[b·kCodes + codes[b]] accumulated left-to-right in double — the
  * per-(query, code-row) hot loop of the PQ scoring fan-out
  * ([[graft.operators.VectorOps]] pqAdcShortlist / ivfPqSearch),
  * replacing an interpreted zip_with + aggregate chain that ran once
  * per OUTPUT pair of the broadcast join.
  *
  * Bitwise parity with the HOF chain: identical lookups summed in
  * identical block order (pure table reads — no arithmetic to
  * reassociate), and an out-of-range lookup nulls the whole score
  * exactly like non-ANSI `element_at` nulls the fold. Pinned in
  * VectorOpsSpec.
  */
case class AdcScore(left: Expression, right: Expression, kCodes: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with Serializable {

  override def prettyName: String = "graft_adc_score"
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(org.apache.spark.sql.types.DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (array<int> codes, array<double> lut), got " +
        s"${l.simpleString(10)} / ${r.simpleString(10)}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var blk = 0
    while (blk < m) {
      val idx = blk * kCodes + codes.getInt(blk)
      if (idx < 0 || idx >= lut.numElements()) return null
      acc += lut.getDouble(idx)
      blk += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val blk = ctx.freshName("blk")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $a.numElements();
         |double $acc = 0.0;
         |for (int $blk = 0; $blk < $m; $blk++) {
         |  int $idx = $blk * $kCodes + $a.getInt($blk);
         |  if ($idx < 0 || $idx >= $b.numElements()) { ${ev.isNull} = true; break; }
         |  $acc += $b.getDouble($idx);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object AdcScore {
  def apply(codes: Column, lut: Column, kCodes: Int): Column =
    GraftSqlBridge.column(AdcScore(
      GraftSqlBridge.expression(codes), GraftSqlBridge.expression(lut), kCodes))
}
