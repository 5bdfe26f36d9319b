package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `graft_kmv(hash, k)` — a K-Minimum-Values distinct-value sketch
  * (Bar-Yossef et al. 2002; Beyer et al., SIGMOD 2007) as a native
  * mergeable [[TypedImperativeAggregate]]: the state is the k
  * SMALLEST DISTINCT hash values seen, `update` is an ordered-set
  * insert that drops the largest element when full, `merge` is set
  * union re-trimmed to k, and `eval` emits the sketch as an ascending
  * `array<bigint>`.
  *
  * Unlike HLL (already in the suite via `approx_count_distinct`), a
  * KMV sketch supports SET ALGEBRA after aggregation: because every
  * sketch is a uniform bottom-k sample of the hashed universe, the
  * k-smallest of two sketches' union is itself the KMV sketch of the
  * set union, and the fraction of that combined sketch present in
  * BOTH inputs estimates Jaccard similarity — so distinct
  * intersections between partitions of a corpus (source × source
  * vocabulary overlap, cross-snapshot document overlap) come from
  * sketch pairs alone, never a corpus-sized join.
  *
  * Determinism contract: the sketch is a pure function of the SET of
  * input hash values — insertion order, partitioning, and merge order
  * are all irrelevant (ordered-set semantics make update/merge
  * commutative, associative, and idempotent) — so a DuckDB oracle
  * reproduces it exactly as `row_number() OVER (ORDER BY h) <= k` on
  * the distinct hashes, and every estimate derived downstream is
  * hash-comparable across engines.
  *
  * Scale shape: constant `8k` bytes of state per group regardless of
  * row count; map-side partial aggregation reduces each partition to
  * one sketch per group before the exchange.
  */
case class KmvSketch(child: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  require(k >= 1 && k <= (1 << 20), s"k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an integral hash column, got ${other.simpleString(10)}")
  }

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long],
                      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v match {
        case x: Long => x
        case x: Int  => x.toLong
      }
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(b1: java.util.TreeSet[Long],
                     b2: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    b1.addAll(b2)
    while (b1.size > k) b1.pollLast()
    b1
  }

  override def eval(buf: java.util.TreeSet[Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketch =
    copy(child = c.head)
}

object KmvSketch {
  def apply(col: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvSketch(GraftSqlBridge.expression(col), k).toAggregateExpression())
}
