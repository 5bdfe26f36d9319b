package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe over a BROADCAST filter —
  * the compiled replacement for the Scala-UDF probe in
  * `graft.operators.BloomJoin` (a UDF pays the serialization /
  * boxed-invocation tax on every fact row of the hottest scan in the
  * plan; the public DataFrame API has no `BloomFilterMightContain`,
  * so extending here follows the [[VectorKernel]] pattern). The
  * broadcast handle rides the expression tree to executors; codegen
  * resolves `broadcast.value` ONCE into generated-class state, so the
  * per-row work is a single virtual `mightContainLong` call inside
  * the scan's WholeStageCodegen — no boxing, no closure dispatch.
  *
  * Semantics: identical to the UDF it replaces (same
  * `BloomFilter.mightContainLong`); no false negatives, so the exact
  * join after the probe keeps the result row-identical to the plain
  * join — the `q30_bloom_join` oracle contract is untouched.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_bloom_might_contain"
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs bigint, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    bloom.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    // unwrap the broadcast once per generated-class instance, not per row
    val filterVar = ctx.addMutableState(classOf[BloomFilter].getName, "bloomFilter",
      v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $filterVar.mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(key: Column, bloom: Broadcast[BloomFilter]): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(key), bloom))
}
