package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point lookup into a serialized count-min sketch — the read side
  * Spark doesn't ship: the `count_min_sketch` AGGREGATE produces a
  * mergeable binary sketch (the single-pass, fixed-memory heavy-
  * hitters summary a 100 TB profile job wants), but SQL offers no
  * estimator over it. `graft_cms_estimate(sketch, item)` returns the
  * sketch's count estimate for a long item.
  *
  * CodegenFallback is deliberate: the lookup runs on post-aggregation
  * relations (top-k candidate rows joined against ONE broadcast
  * sketch), never on data-sized inputs, so per-row interpretation is
  * noise while a codegen'd deserializer would be complexity with no
  * hot path to serve. The per-call `readFrom` cost is bounded by the
  * candidate count.
  */
case class CmsEstimate(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback with Serializable {

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (binary sketch, bigint item), got " +
          s"${left.dataType.simpleString(10)} / ${right.dataType.simpleString(10)}")

  override def nullSafeEval(sketchBytes: Any, item: Any): Any = {
    val cms = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketchBytes.asInstanceOf[Array[Byte]]))
    cms.estimateCount(java.lang.Long.valueOf(item.asInstanceOf[Long]))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object CmsEstimate {
  def apply(sketch: Column, item: Column): Column =
    GraftSqlBridge.column(
      CmsEstimate(GraftSqlBridge.expression(sketch), GraftSqlBridge.expression(item)))
}
