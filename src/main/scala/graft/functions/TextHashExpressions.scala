package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass compiled kernels shared by the text-dedup signature
  * builders. The HOF formulations (`transform`/`aggregate`) evaluate
  * INTERPRETED in Spark — a per-element lambda-frame cost that
  * dominated the dedup map stages (shingling a 5k-doc corpus cost
  * seconds; 64 per-bit `aggregate` folds doubled SimHash). Each
  * kernel here tokenizes once and runs one tight JIT-compiled loop;
  * bitwise parity with the HOF reference formulations is proven in
  * DedupSpec/PropertySpec.
  */
object GraftTextKernels {
  private val WS: Pattern = Pattern.compile("\\s+")

  /** split(trim(text), "\\s+") with Spark's limit=-1 semantics. */
  def tokens(text: UTF8String): Array[String] =
    WS.split(text.trim.toString, -1)

  private def hashString(s: String): Long = {
    val b = s.getBytes("UTF-8")
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit md5 prefix of `s` — the CROSS-ENGINE base hash of the
    * certified dedup family: numerically identical to the SQL both
    * engines can run, `CAST(('0x' || substr(md5(s), 1, 15)) AS
    * BIGINT)` (first 15 hex nibbles = the big-endian u64 of md5
    * bytes 0..7 shifted right 4). 60 bits (not 64) because a 16-nibble
    * value can exceed BIGINT's signed range and the SQL cast would
    * fail; the certified family's collision budget is set by the
    * 31-bit permutation field anyway. ~3-5× an xxhash64 call on short
    * shingles — confined to the signing map stage, which one corpus
    * scan amortizes; [[hashString]] remains for callers that keep the
    * cheaper JVM-only family.
    */
  def md5_60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val u64 =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
        ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    u64 >>> 4
  }

  /** [[md5_60]] over a UTF8String — codegen entry point. */
  def md5_60Utf8(s: UTF8String): Long = md5_60(s.toString)

  /** xxhash64 of each DISTINCT word n-gram of `text` (short docs fall
    * back to one whole-doc shingle) — semantically
    * `transform(Dedup.shingles(text, n), s -> xxhash64(s))`, hash-set
    * equal to the HOF chain (dedup here is by hash value; a
    * same-document hash collision has P ≈ |sh|²/2⁶⁵).
    */
  def shingleHashes(text: UTF8String, n: Int): ArrayData =
    shingleHashesWith(text, n, hashString)

  /** [[shingleHashes]] with the cross-engine 60-bit md5 base hash —
    * the shingle set a DuckDB oracle re-derives verbatim
    * (`list_distinct(list_transform(shingles, s -> CAST(('0x' ||
    * substr(md5(s), 1, 15)) AS BIGINT)))`).
    */
  def shingleHashesMd5(text: UTF8String, n: Int): ArrayData =
    shingleHashesWith(text, n, md5_60)

  private def shingleHashesWith(text: UTF8String, n: Int,
                                hash: String => Long): ArrayData = {
    val toks = tokens(text)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        seen.add(hash(sb.toString))
        i += 1
      }
    } else {
      seen.add(hash(toks.mkString(" ")))
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash of `text` — semantically identical to
    * [[graft.operators.Dedup.simhashColumn]]: per bit b of each
    * distinct token's xxhash64, vote ±1; signature bit = vote ≥ 0;
    * packed as two acc*2+bit halves, high half from hash bits 32..63.
    */
  def simhash64(text: UTF8String): Long = {
    val toks = tokens(text)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Long](64)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = hashString(toks(i))
        var k = 0
        while (k < 64) {
          votes(k) += ((h >>> k) & 1L) * 2L - 1L
          k += 1
        }
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) {
      lo = lo * 2 + (if (votes(b) >= 0) 1L else 0L)
      hi = hi * 2 + (if (votes(32 + b) >= 0) 1L else 0L)
      b += 1
    }
    (hi << 32) | lo
  }

  /** 60-bit SimHash with the cross-engine base hash: per bit b
    * (0..59) of each distinct token's [[md5_60]], vote ±1; signature
    * bit b = vote ≥ 0, packed little-endian (`sum(1 << b)` — the
    * packing a SQL `sum(CASE WHEN v >= 0 THEN 1 << b END)` twin
    * reproduces directly). 60 bits give the same banded-pigeonhole
    * guarantees as 64 (bands split the value range that actually
    * varies); always non-negative, so integer casts can never
    * sign-surprise an oracle.
    */
  def simhash60(text: UTF8String): Long = {
    val toks = tokens(text)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Long](60)
    var i = 0
    while (i < toks.length) {
      if (seen.add(toks(i))) {
        val h = md5_60(toks(i))
        var k = 0
        while (k < 60) {
          votes(k) += ((h >>> k) & 1L) * 2L - 1L
          k += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) >= 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}

/** `graft_shingle_hashes(text, n)` — hashed distinct word n-gram
  * shingles as one compiled pass (tokenize → slide → hash → dedup).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  require(n >= 1 && n <= 16, s"shingle width out of range: $n")

  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.shingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GraftTextKernels.shingleHashes($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  def apply(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(text), n))
}

/** `graft_simhash64(text)` — 64-bit SimHash in one compiled pass. */
case class SimHash64(child: Expression)
    extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_simhash64"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GraftTextKernels.simhash64($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  def apply(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))
}

/** `graft_shingle_hashes_md5(text, n)` — the cross-engine twin of
  * [[ShingleHashes]]: same one-pass kernel, 60-bit md5 base hash, so
  * a SQL oracle re-derives the identical shingle sets.
  */
case class ShingleHashesMd5(child: Expression, n: Int)
    extends UnaryExpression with Serializable {

  require(n >= 1 && n <= 16, s"shingle width out of range: $n")

  override def prettyName: String = "graft_shingle_hashes_md5"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.shingleHashesMd5(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GraftTextKernels.shingleHashesMd5($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashesMd5 {
  def apply(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHashesMd5(GraftSqlBridge.expression(text), n))
}

/** `graft_simhash60(text)` — the cross-engine twin of [[SimHash64]]:
  * 60-bit md5-based SimHash in one compiled pass.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression with Serializable {

  override def prettyName: String = "graft_simhash60"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    GraftTextKernels.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GraftTextKernels.simhash60($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def apply(text: Column): Column =
    GraftSqlBridge.column(SimHash60(GraftSqlBridge.expression(text)))
}
