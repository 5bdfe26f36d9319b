package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic md5 feature-hash text embedder — the engine's
  * stand-in for Chroma's default embedding function (upstream embeds
  * documents server-side when `add`/`query` receive no embeddings; a
  * neural model is out of scope here, and the STUB discipline for
  * absent runtimes is established by the multimodal codecs). Feature
  * hashing ("the hashing trick") makes similarity queries behave
  * sensibly — shared tokens pull vectors together — while staying
  * byte-for-byte reproducible in ANY engine with md5, which is what
  * keeps the auto-embed ingest path DuckDB-oracle-checkable.
  *
  * Spec: tokens = whitespace split of lower(trim(text)); per token,
  * idx = int(md5hex[0..8)) mod dim and sign = +1 if md5hex[8] < '8'
  * else −1; accumulate sign into acc[idx] (integer-valued, order
  * free); L2-normalize in double (all-zero stays all-zero); cast each
  * component to float32. Both engines round at exactly these points,
  * so stored vectors are bitwise identical.
  */
object GraftEmbedKernel {
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex9(s: String): String = {
    val d = md5Local.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    // only the first 9 hex chars are consumed (8 for the index, 1 for
    // the sign) — 5 bytes of digest
    val out = new Array[Char](10)
    var i = 0
    while (i < 5) {
      out(2 * i) = HexChars((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def hashEmbed(text: UTF8String, dim: Int): ArrayData = {
    val toks = GraftTextKernels.tokens(text.toLowerCase)
    val acc = new Array[Double](dim)
    var i = 0
    while (i < toks.length) {
      val hex = md5Hex9(toks(i))
      val idx = (java.lang.Long.parseLong(hex.substring(0, 8), 16) % dim).toInt
      val sign = if (Character.digit(hex.charAt(8), 16) < 8) 1.0 else -1.0
      acc(idx) += sign
      i += 1
    }
    var sq = 0.0
    var k = 0
    while (k < dim) { sq += acc(k) * acc(k); k += 1 }
    val norm = math.sqrt(sq)
    val out = new Array[Float](dim)
    if (norm > 0) {
      k = 0
      while (k < dim) { out(k) = (acc(k) / norm).toFloat; k += 1 }
    }
    new GenericArrayData(out)
  }
}

/** `graft_hash_embed(text, dim)` — one compiled pass from document
  * text to its feature-hash embedding.
  */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression with Serializable {

  require(dim >= 2 && dim <= 4096, s"embedding dim out of range: $dim")

  override def prettyName: String = "graft_hash_embed"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.simpleString(10)}")
  }

  override def nullSafeEval(input: Any): Any =
    GraftEmbedKernel.hashEmbed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.GraftEmbedKernel.hashEmbed($t, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashEmbed {
  def apply(text: Column, dim: Int): Column =
    GraftSqlBridge.column(HashEmbed(GraftSqlBridge.expression(text), dim))
}
