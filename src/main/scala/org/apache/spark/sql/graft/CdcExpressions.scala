package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType,
  LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking in ONE codegen'd pass per document — the
  * fused form of [[graft.dedup.Dedup.cdcChunks]]'s declarative
  * pipeline (explode per-position windows → md5 filter → per-doc
  * lead() window), which paid a per-window UTF8String allocation, an
  * exploded row per character, and a per-doc shuffle+sort for the
  * boundary pairing. Here the window hash test, boundary pairing and
  * chunk keying all happen inside one expression evaluation: zero
  * extra rows, zero Exchange — the downstream chunk-key aggregate is
  * the only shuffle left, which is the 100 TB shape.
  *
  * Semantics are bit-identical to the declarative form (spec-pinned):
  * a boundary sits at every position p ∈ [2, len−7] whose 8-CHAR
  * window md5 starts with a 0 nibble, position 1 is always a
  * boundary, docs shorter than 8 chars emit nothing; each chunk emits
  * (clen, ckey) with ckey = first 15 md5 hex digits of the chunk text
  * as a 60-bit long. Positions count CODE POINTS (Spark/DuckDB
  * substring semantics), so the byte walk tracks UTF-8 boundaries.
  */
object CdcUtil {

  private val STRUCT = StructType(Seq(
    StructField("clen", LongType, nullable = false),
    StructField("ckey", LongType, nullable = false)))

  val dataType: DataType = ArrayType(STRUCT, containsNull = false)

  /** First 15 hex digits of the digest as a long (60 bits) — exactly
    * `conv(substring(md5(x), 1, 15), 16, 10)`. */
  private def key60(digest: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xFFL); i += 1 }
    (v << 4) | ((digest(7) >> 4) & 0xFL)
  }

  def chunks(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    // code-point start byte-offsets (a UTF-8 byte starts a code point
    // iff it is not a continuation byte)
    val starts = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { starts(n) = i; n += 1 }
      i += 1
    }
    starts(n) = bytes.length
    if (n < 8) return new GenericArrayData(Array.empty[Any])
    // byte end of the 0-based-exclusive char index q
    @inline def byteEnd(q: Int): Int =
      if (q < n) starts(q) else bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    // boundaries as 1-based char positions; position 1 always
    val bps = new Array[Int](n)
    var nb = 0
    bps(nb) = 1; nb += 1
    var p = 2
    while (p <= n - 7) {
      val from = starts(p - 1)
      md.update(bytes, from, byteEnd(p + 7) - from)
      if ((md.digest()(0) & 0xF0) == 0) { bps(nb) = p; nb += 1 }
      p += 1
    }
    val out = new Array[Any](nb)
    var b = 0
    while (b < nb) {
      val bp = bps(b)
      val np = if (b + 1 < nb) bps(b + 1) else n + 1
      val from = starts(bp - 1)
      md.update(bytes, from, byteEnd(np - 1) - from)
      out(b) = new GenericInternalRow(
        Array[Any]((np - bp).toLong, key60(md.digest())))
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** [[CdcUtil.chunks]] as a codegen'd unary expression:
  * `cdc_chunks(text)` → array<struct<clen, ckey>>. */
case class CdcChunksExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = CdcUtil.dataType
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcUtil.chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CdcUtil.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}
