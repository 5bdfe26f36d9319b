package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MinHash signature over a shingle array — the sketch-build
  * kernel for near-dup detection. Replaces the nested HOF
  * formulation (`transform(sequence(0,63), i -> array_min(transform(
  * hashes, h -> xxhash64(i, h))))`), which evaluates interpreted and
  * dominates the dedup map stage.
  *
  * Hash semantics mirror Spark's `xxhash64` fold EXACTLY so the
  * kernel is bitwise-interchangeable with the HOF version:
  *   base(s)  = XXH64(bytes(s), seed=42)            — xxhash64(s)
  *              (a NULL shingle contributes the seed itself, 42 —
  *               xxhash64 skips null inputs)
  *   perm_i   = XXH64.hashLong(base, XXH64.hashInt(i, 42))
  *                                                  — xxhash64(i, base),
  *              where i is INT (sequence() yields ints → hashInt)
  *   sig[i]   = min over shingles of perm_i
  *   sig of an EMPTY array = [null × perms]          — array_min([]) is
  *              null per position, matching the HOF exactly
  * One pass over the strings (each hashed once), a tight perms-wide
  * inner loop of hashLong — no boxing, no per-element lambda frames.
  */
case class MinHashSignature(child: Expression, perms: Int)
    extends UnaryExpression with Serializable {

  require(perms >= 1 && perms <= 1024, s"perms out of range: $perms")

  override def prettyName: String = "graft_minhash"
  // containsNull: an empty shingle array yields [null × perms]
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true

  /** Accepts raw shingle strings OR pre-hashed shingles (array<long>,
    * e.g. from [[ShingleHashes]]) — the long path skips re-hashing the
    * strings and produces the IDENTICAL signature, because the string
    * path's per-shingle base value is exactly `xxhash64(s)`.
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> or array<long>, got ${other.simpleString(10)}")
  }

  private def hashedInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** seeds[i] = XXH64.hashInt(i, 42) — the inner fold's per-perm seed
    * (the HOF's `sequence(0, perms-1)` yields INT elements, which
    * Spark's xxhash64 hashes with hashInt, not hashLong).
    */
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(perms)(i => XXH64.hashInt(i, 42L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](perms)) // [null × perms]
    val mins = Array.fill(perms)(Long.MaxValue)
    val hashed = hashedInput
    var j = 0
    while (j < n) {
      // null shingle → xxhash64(NULL) = the seed itself (42)
      val base =
        if (arr.isNullAt(j)) 42L
        else if (hashed) arr.getLong(j)
        else {
          val s = arr.getUTF8String(j)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        }
      var i = 0
      while (i < perms) {
        val v = XXH64.hashLong(base, seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val xxh = classOf[XXH64].getName
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val baseExpr =
        if (hashedInput)
          s"long $base = $a.isNullAt($j) ? 42L : $a.getLong($j);"
        else
          s"""org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
             |    long $base = ($s == null) ? 42L
             |      : $xxh.hashUnsafeBytes($s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);""".stripMargin
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$perms]);
         |} else {
         |  long[] $mins = new long[$perms];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    $baseExpr
         |    for (int $i = 0; $i < $perms; $i++) {
         |      long $v = $xxh.hashLong($base, $seedsRef[$i]);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  def apply(shingles: Column, perms: Int): Column =
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(shingles), perms))
}

/** Codegen'd CROSS-ENGINE MinHash signature — the certification twin
  * of [[MinHashSignature]]. Permutation i is the classic universal
  * hash over the 31-bit Mersenne prime p = 2³¹−1:
  *   x        = base % p, base the shingle's 60-bit md5 prefix
  *              ([[GraftTextKernels.md5_60]], = the SQL both engines
  *              run: `CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)`)
  *   a_i      = md5_60("mh:a:" + i) % (p−1) + 1   (never 0)
  *   b_i      = md5_60("mh:b:" + i) % p
  *   perm_i   = (a_i · x + b_i) % p
  *   sig[i]   = min over shingles; empty array → [null × perms]
  * Every operand stays below 2⁶² (a_i, x < 2³¹), so the arithmetic is
  * ANSI-overflow-safe in BOTH engines' BIGINT — which is the whole
  * point: a DuckDB oracle re-derives the grid constants from the same
  * md5 formula and replays the signatures, band keys and estimates
  * bit for bit. Per-shingle cost ≈ one md5 (base) + perms
  * multiply-mods — the multiply-mod inner loop is CHEAPER than the
  * xx-family's per-perm hashLong fold; only the base hash costs more.
  */
case class MinHashGridSignature(child: Expression, perms: Int)
    extends UnaryExpression with Serializable {

  require(perms >= 1 && perms <= 1024, s"perms out of range: $perms")

  override def prettyName: String = "graft_minhash_grid"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true

  /** Raw shingle strings (hashed with md5_60 here) OR pre-hashed
    * 60-bit shingles from [[ShingleHashesMd5]] — identical output,
    * because the string path's base IS md5_60(s).
    */
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string> or array<long>, got ${other.simpleString(10)}")
  }

  private def hashedInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  @transient private lazy val aConst: Array[Long] = Array.tabulate(perms)(i =>
    GraftTextKernels.md5_60(s"mh:a:$i") % (MinHashGridSignature.P - 1) + 1)
  @transient private lazy val bConst: Array[Long] = Array.tabulate(perms)(i =>
    GraftTextKernels.md5_60(s"mh:b:$i") % MinHashGridSignature.P)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](perms))
    val p = MinHashGridSignature.P
    val mins = Array.fill(perms)(Long.MaxValue)
    val hashed = hashedInput
    var j = 0
    while (j < n) {
      // null shingle → the empty string's base (can't occur from
      // ShingleHashesMd5, whose output has containsNull = false)
      val base =
        if (arr.isNullAt(j)) GraftTextKernels.md5_60("")
        else if (hashed) arr.getLong(j)
        else GraftTextKernels.md5_60Utf8(arr.getUTF8String(j))
      val x = base % p
      var i = 0
      while (i < perms) {
        val v = (aConst(i) * x + bConst(i)) % p
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashGridA", aConst, "long[]")
    val bRef = ctx.addReferenceObj("minhashGridB", bConst, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val baseExpr =
        if (hashedInput)
          s"""long $x = ($a.isNullAt($j)
             |      ? graft.functions.GraftTextKernels.md5_60("")
             |      : $a.getLong($j)) % ${MinHashGridSignature.P}L;""".stripMargin
        else
          s"""org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($j);
             |    long $x = (($s == null)
             |      ? graft.functions.GraftTextKernels.md5_60("")
             |      : graft.functions.GraftTextKernels.md5_60Utf8($s)) % ${MinHashGridSignature.P}L;""".stripMargin
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$perms]);
         |} else {
         |  long[] $mins = new long[$perms];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    $baseExpr
         |    for (int $i = 0; $i < $perms; $i++) {
         |      long $v = ($aRef[$i] * $x + $bRef[$i]) % ${MinHashGridSignature.P}L;
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashGridSignature {
  /** 2³¹ − 1, the Mersenne prime every grid permutation works in. */
  val P: Long = 2147483647L

  def apply(shingles: Column, perms: Int): Column =
    GraftSqlBridge.column(MinHashGridSignature(GraftSqlBridge.expression(shingles), perms))
}
