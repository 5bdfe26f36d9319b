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
