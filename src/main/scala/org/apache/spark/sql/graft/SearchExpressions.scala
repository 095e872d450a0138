package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document search analysis for the q60 batch ranker:
  * given the raw text and the (plan-literal) query vocabulary, emit
  * every field length and every query-term hit of the six-analyzer
  * `most_fields` model in a SINGLE tokenization pass — replacing the
  * five whole-string scans plus two `regexp_replace` rewrites the
  * declarative derivation cost (measured the dominant share of q60's
  * wall time; the postings that survive are a few hundred rows).
  *
  * Semantics are EXACTLY the declarative composition they replace
  * (spec-pinned field-for-field in Round13OpsSpec, and q60's
  * driver-side BM25 replay plus the DuckDB oracle are unchanged):
  *
  *   - raw tokens: Java-regex `\s+` split of the text, empties
  *     dropped (the `TextFunctions.tokens` contract)
  *   - toks: the SAME split of `toLowerCase(Locale.ROOT)` of the
  *     whole text (the [[ShingleUtil]] composition — lowering never
  *     creates or destroys `\s` whitespace, so raw and lower tokens
  *     correspond 1:1 even where lowering changes string length)
  *   - nrm: per-token strip of `[^a-z0-9]`, empties dropped —
  *     equivalent to the whole-text
  *     `regexp_replace(lower(text), "[^a-z0-9\\s]", "")` because
  *     whitespace survives that strip (tokens never merge)
  *   - sub: maximal `[a-z0-9]+` runs per token — equivalent to the
  *     whole-text `regexp_replace(lower(text), "[^a-z0-9]+", " ")`
  *     re-split, because original whitespace is itself a run break
  *   - big: adjacent-token 2-gram shingles of toks
  *   - a_*: the members of each field's token stream that appear in
  *     the query vocabulary, order and duplicates preserved (tf is
  *     counted downstream); `a_name`/`a_exact` see only the first 8
  *     lower/raw tokens, `a_ph2` matches against the query bigrams
  *
  * Field lengths are taken BEFORE the vocabulary filter (BM25 length
  * norms see the whole document). `ph_len` is `max(|toks|-1, 0)`
  * without materializing the bigrams; a bigram string is only
  * assembled when its head token appears as some query bigram's
  * first word, so the common token never allocates.
  */
object SearchAnalyzeUtil {

  // Java regex \s without UNICODE_CHARACTER_CLASS: exactly these six.
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
      c == '\f' || c == '\r'

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  private def splitWs(s: String): java.util.ArrayList[String] = {
    val out = new java.util.ArrayList[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val st = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > st) out.add(s.substring(st, i))
    }
    out
  }

  def analyze(text: UTF8String,
      qWords: java.util.HashSet[String],
      qBigrams: java.util.HashSet[String],
      qBigramHeads: java.util.HashSet[String]): InternalRow = {
    val s = text.toString
    val raws = splitWs(s)
    val toks = splitWs(s.toLowerCase(java.util.Locale.ROOT))
    val nTok = toks.size
    val aName = new java.util.ArrayList[Any]
    val aExact = new java.util.ArrayList[Any]
    val aDesc = new java.util.ArrayList[Any]
    val aNorm = new java.util.ArrayList[Any]
    val aTok = new java.util.ArrayList[Any]
    val aPh2 = new java.util.ArrayList[Any]
    var normLen = 0L
    var tokLen = 0L
    var i = 0
    while (i < nTok) {
      val lt = toks.get(i)
      if (qWords.contains(lt)) {
        val u = UTF8String.fromString(lt)
        if (i < 8) aName.add(u)
        aDesc.add(u)
      }
      if (i < 8 && i < raws.size && qWords.contains(raws.get(i)))
        aExact.add(UTF8String.fromString(raws.get(i)))
      // normalized analyzer: strip non-[a-z0-9], drop emptied tokens
      var keep = 0
      var j = 0
      while (j < lt.length) { if (isAlnum(lt.charAt(j))) keep += 1; j += 1 }
      if (keep > 0) {
        normLen += 1
        val nt =
          if (keep == lt.length) lt
          else {
            val sb = new java.lang.StringBuilder(keep)
            var k = 0
            while (k < lt.length) {
              val c = lt.charAt(k)
              if (isAlnum(c)) sb.append(c)
              k += 1
            }
            sb.toString
          }
        if (qWords.contains(nt)) aNorm.add(UTF8String.fromString(nt))
      }
      // sub-token analyzer: maximal [a-z0-9]+ runs within the token
      j = 0
      while (j < lt.length) {
        while (j < lt.length && !isAlnum(lt.charAt(j))) j += 1
        val st = j
        while (j < lt.length && isAlnum(lt.charAt(j))) j += 1
        if (j > st) {
          tokLen += 1
          val piece = lt.substring(st, j)
          if (qWords.contains(piece))
            aTok.add(UTF8String.fromString(piece))
        }
      }
      // phrase shingles: assemble the bigram only on a head hit
      if (i + 1 < nTok && qBigramHeads.contains(lt)) {
        val b = lt + " " + toks.get(i + 1)
        if (qBigrams.contains(b)) aPh2.add(UTF8String.fromString(b))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        math.min(8L, nTok.toLong), nTok.toLong, normLen, tokLen,
        math.max(nTok.toLong - 1L, 0L),
        new GenericArrayData(aName.toArray),
        new GenericArrayData(aExact.toArray),
        new GenericArrayData(aDesc.toArray),
        new GenericArrayData(aNorm.toArray),
        new GenericArrayData(aTok.toArray),
        new GenericArrayData(aPh2.toArray)))
  }
}

/** [[SearchAnalyzeUtil.analyze]] as a codegen'd unary expression: the
  * query vocabulary is a plan literal (fixed at build time), carried
  * as three referenced hash sets in the generated class. */
case class SearchAnalyzeExpr(child: Expression,
    qWords: Seq[String], qBigrams: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = SearchAnalyzeExpr.schema
  override def prettyName: String = "search_analyze"

  @transient private lazy val qwSet = {
    val s = new java.util.HashSet[String](); qWords.foreach(s.add); s
  }
  @transient private lazy val qbSet = {
    val s = new java.util.HashSet[String](); qBigrams.foreach(s.add); s
  }
  @transient private lazy val qbHeads = {
    val s = new java.util.HashSet[String]()
    qBigrams.foreach(b => s.add(b.substring(0, b.indexOf(' '))))
    s
  }

  override def nullSafeEval(input: Any): Any =
    SearchAnalyzeUtil.analyze(
      input.asInstanceOf[UTF8String], qwSet, qbSet, qbHeads)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode = {
    val qw = ctx.addReferenceObj("qwSet", qwSet)
    val qb = ctx.addReferenceObj("qbSet", qbSet)
    val qh = ctx.addReferenceObj("qbHeads", qbHeads)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SearchAnalyzeUtil.analyze($c, $qw, $qb, $qh)")
  }

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}

object SearchAnalyzeExpr {
  val schema: StructType = StructType(Seq(
    StructField("name_len", LongType, nullable = false),
    StructField("desc_len", LongType, nullable = false),
    StructField("norm_len", LongType, nullable = false),
    StructField("tok_len", LongType, nullable = false),
    StructField("ph_len", LongType, nullable = false),
    StructField("a_name", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("a_exact", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("a_desc", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("a_norm", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("a_tok", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("a_ph2", ArrayType(StringType, containsNull = false),
      nullable = false)))
}
