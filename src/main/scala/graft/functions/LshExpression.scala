package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd multi-table random-hyperplane LSH signatures: for each
  * of `tables` tables, bit b = sign(v · plane_b), packed MSB-first —
  * one compiled triple loop per vector instead of
  * tables × bitsPerTable interpreted `aggregate(zip_with(...))`
  * folds (the map-stage cost that dominated the ANN/near-dup index
  * builds).
  *
  * Bitwise parity with [[graft.operators.VectorOps.lshSignature]]:
  * the dot product accumulates left-to-right in double, bits fold as
  * acc*2+bit in plane order. A dimension-mismatched vector yields
  * all-zero signatures, exactly like the HOF chain (zip_with pads
  * with null → null fold → `when` falls through to 0 per bit).
  */
case class LshSignatures(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with Serializable {

  private val tables = planes.length
  private val bits = planes.head.length
  private val dim = planes.head.head.length
  require(planes.forall(t => t.length == bits && t.forall(_.length == dim)),
    "ragged hyperplane table")

  override def prettyName: String = "graft_lsh_signatures"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got ${other.simpleString(10)}")
  }

  private def isDoubleIn: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  /** [table][bit][dim] flattened row-major for a cache-friendly scan. */
  @transient private lazy val flat: Array[Double] =
    planes.flatten.flatten.toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Long](tables)
    if (n == dim) {
      val dbl = isDoubleIn
      var t = 0
      while (t < tables) {
        var sig = 0L
        var b = 0
        while (b < bits) {
          val off = (t * bits + b) * dim
          var dot = 0.0
          var i = 0
          while (i < n) {
            val xv = if (dbl) x.getDouble(i) else x.getFloat(i).toDouble
            dot += xv * flat(off + i)
            i += 1
          }
          sig = sig * 2 + (if (dot >= 0) 1L else 0L)
          b += 1
        }
        out(t) = sig
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    val getX =
      if (isDoubleIn) (a: String, i: String) => s"$a.getDouble($i)"
      else (a: String, i: String) => s"(double) $a.getFloat($i)"
    nullSafeCodeGen(ctx, ev, a => {
      val sigs = ctx.freshName("sigs")
      val n = ctx.freshName("n")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val sig = ctx.freshName("sig")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |long[] $sigs = new long[$tables];
         |if ($n == $dim) {
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $sig = 0L;
         |    for (int $b = 0; $b < $bits; $b++) {
         |      int $off = ($t * $bits + $b) * $dim;
         |      double $dot = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        $dot += ${getX(a, i)} * $planesRef[$off + $i];
         |      }
         |      $sig = $sig * 2 + ($dot >= 0 ? 1L : 0L);
         |    }
         |    $sigs[$t] = $sig;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignatures {
  def apply(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    GraftSqlBridge.column(LshSignatures(GraftSqlBridge.expression(vec), planes))
}
