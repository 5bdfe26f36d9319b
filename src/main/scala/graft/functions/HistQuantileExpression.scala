package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `graft_hist_quantile(col, lo, hi, bins, q)` — a MERGEABLE
  * fixed-grid quantile sketch as a native Catalyst
  * [[TypedImperativeAggregate]]: the aggregation-buffer state is one
  * `Array[Long]` of bucket counts, `update` is a clamped bucket
  * increment, `merge` is cell-wise addition (commutative and
  * associative, so partial aggregation and any shuffle-merge order
  * give the IDENTICAL sketch — unlike centroid-based digests, whose
  * merge order perturbs the estimate), and `eval` walks the
  * cumulative counts to the target rank and returns the owning
  * bucket's midpoint. Error is bounded by half the bucket width BY
  * CONSTRUCTION, and the estimate is a pure function of exact integer
  * counts — bit-reproducible across engines, which is what lets the
  * driver hash-compare it against a DuckDB re-derivation.
  *
  * Scale shape: constant `bins·8` bytes of state per group regardless
  * of row count, map-side partial aggregation combines before the
  * exchange, and only sketches — never values — cross the network.
  * The exact-sort percentile this replaces needs a per-group sort of
  * the data; the sketch needs one scan.
  */
case class HistQuantile(child: Expression, lo: Double, hi: Double,
                        bins: Int, q: Double,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(bins >= 1 && bins <= (1 << 20), s"bins out of range: $bins")
  require(hi > lo, s"empty value range [$lo, $hi)")
  require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")

  private val width = (hi - lo) / bins

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hist_quantile"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a numeric column, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case x: Double => x
        case x: Float => x.toDouble
        case x: Long => x.toDouble
        case x: Int => x.toDouble
        case x: Short => x.toDouble
        case x: Byte => x.toDouble
        case x: Decimal => x.toDouble
      }
      // out-of-range values clamp to the edge buckets instead of being
      // dropped: the sketch stays a true count of ALL non-null rows
      val idx = math.min(bins - 1, math.max(0,
        math.floor((d - lo) / width).toInt))
      buf(idx) += 1L
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var total = 0L
    var i = 0
    while (i < bins) { total += buf(i); i += 1 }
    if (total == 0L) null
    else {
      val rank = math.max(1L, math.ceil(q * total).toLong)
      var cum = 0L
      i = 0
      while (i < bins && cum < rank) { cum += buf(i); i += 1 }
      lo + (i - 1 + 0.5) * width
    }
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * bins)
    var i = 0
    while (i < bins) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bins)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(n: Int): HistQuantile =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HistQuantile =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistQuantile =
    copy(child = c.head)
}

object HistQuantile {
  def apply(col: Column, lo: Double, hi: Double, bins: Int, q: Double): Column =
    GraftSqlBridge.column(
      HistQuantile(GraftSqlBridge.expression(col), lo, hi, bins, q)
        .toAggregateExpression())
}
