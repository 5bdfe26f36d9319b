package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Order-16 HILBERT curve index — the locality-superior sibling of
  * [[graft.operators.Layout.mortonZ]]: maps (x, y) ∈ [0, 65536)² to
  * the position d ∈ [0, 2³²) at which the Hilbert curve visits that
  * cell. Unlike the Z-curve, the Hilbert curve never jumps — every
  * consecutive pair of d values is an orthogonal unit step — so files
  * written along contiguous d ranges cover COMPACT rectangles with no
  * diagonal seam-crossings, which is why table formats that cluster
  * for multi-dimensional pruning prefer it when available.
  *
  * The index is the classic 16-round bit descent (rot-and-reflect per
  * quadrant; Hilbert 1891 via the standard xy2d formulation): pure
  * integer shifts/compares, generated as a tight Java loop
  * (whole-stage codegen, one expression node) and replayed in the
  * DuckDB oracle as 16 unrolled relational steps — the curve
  * arithmetic itself is cross-engine certified, the
  * [[graft.operators.Layout]] discipline.
  *
  * Inputs are masked to their low 16 bits (callers bucket/normalize
  * first, same contract as `mortonZ`); null in → null out.
  */
case class HilbertIndex(left: Expression, right: Expression)
  extends BinaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (bigint, bigint) inputs, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def prettyName: String = "graft_hilbert"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & 65535L;
         |long $y = $b & 65535L;
         |long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object HilbertIndex {

  /** Reference implementation — the loop the generated Java mirrors
    * statement-for-statement (specs compare the two, and the DuckDB
    * oracle unrolls exactly these 16 steps).
    */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & 65535L
    var y = y0 & 65535L
    var d = 0L
    var s = 32768L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def apply(x: Column, y: Column): Column =
    GraftSqlBridge.column(HilbertIndex(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(y)))
}
