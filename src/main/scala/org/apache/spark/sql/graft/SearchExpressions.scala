package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document search analysis for the q60 batch ranker:
  * given the raw text and the (plan-literal) query vocabulary, emit
  * every field length and the COMPLETE per-document postings of the
  * seven-field `most_fields` model — (field id, term id, tf) int
  * structs — in a SINGLE tokenization pass.
  *
  * This replaces both the five whole-string scans of the declarative
  * derivation AND the downstream explode + string-keyed
  * (doc, field, term) aggregate: on the synthetic corpus the query
  * vocabulary matches ~60% of all tokens, so the string hit arrays
  * exploded to ~570k rows per 5k docs that then had to shuffle
  * through a hash aggregate — per-document tf counting against a
  * ~100-slot int array inside the expression is the same numbers at
  * a fraction of the cost, and the emitted postings are final
  * (grouping already done, row count == |postings|). The `kw` field
  * (keyword-set membership, desc tf >= 3, norms off => tf = 1) is
  * derived here too, so no downstream branch re-reads the postings
  * subtree (the pushed-filter-asymmetry trap in CLAUDE.md).
  *
  * Tokenization semantics are EXACTLY the declarative composition
  * (spec-pinned per field as tf multisets in Round13OpsSpec; q60's
  * DuckDB oracle is unchanged):
  *
  *   - raw tokens: Java-regex `\s+` split of the text, empties
  *     dropped (the `TextFunctions.tokens` contract)
  *   - toks: the SAME split of `toLowerCase(Locale.ROOT)` of the
  *     whole text (lowering never creates or destroys `\s`
  *     whitespace, so raw and lower tokens correspond 1:1)
  *   - nrm: per-token strip of `[^a-z0-9]`, empties dropped —
  *     equivalent to the whole-text
  *     `regexp_replace(lower(text), "[^a-z0-9\\s]", "")`
  *   - sub: maximal `[a-z0-9]+` runs per token — equivalent to the
  *     whole-text `regexp_replace(lower(text), "[^a-z0-9]+", " ")`
  *     re-split
  *   - big: adjacent-token 2-gram shingles of toks; a bigram string
  *     is only assembled when its head token appears as some query
  *     bigram's first word
  *
  * Field ids: 0 name (first 8 lower tokens), 1 exact (first 8 RAW
  * tokens, case-identical match), 2 desc (all lower tokens), 3 kw
  * (desc tf >= 3, emitted with tf = 1), 4 norm, 5 tok, 6 ph2
  * (bigrams). Term ids index the qWords literal for fields 0-5 and
  * the qBigrams literal for field 6. Field lengths are taken BEFORE
  * the vocabulary filter (BM25 length norms see the whole document);
  * `ph_len` is `max(|toks|-1, 0)`.
  */
object SearchAnalyzeUtil {

  val FID_NAME = 0
  val FID_EXACT = 1
  val FID_DESC = 2
  val FID_KW = 3
  val FID_NORM = 4
  val FID_TOK = 5
  val FID_PH2 = 6

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
      qwIdx: java.util.HashMap[String, Integer],
      qbIdx: java.util.HashMap[String, Integer],
      qbHeads: java.util.HashSet[String]): InternalRow = {
    val s = text.toString
    val raws = splitWs(s)
    val toks = splitWs(s.toLowerCase(java.util.Locale.ROOT))
    val nTok = toks.size
    val nW = qwIdx.size
    val nB = qbIdx.size
    // tf counters: five word-field planes over the word vocab, one
    // bigram plane — ~100 ints total for the literal query set
    val cnt = new Array[Int](5 * nW + nB)
    @inline def bump(plane: Int, tid: Int): Unit =
      cnt(plane * nW + tid) += 1
    var normLen = 0L
    var tokLen = 0L
    var i = 0
    while (i < nTok) {
      val lt = toks.get(i)
      val wi = qwIdx.get(lt)
      if (wi != null) {
        if (i < 8) bump(0, wi) // name
        bump(2, wi) // desc
      }
      if (i < 8 && i < raws.size) {
        val ri = qwIdx.get(raws.get(i))
        if (ri != null) bump(1, ri) // exact
      }
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
        val ni = qwIdx.get(nt)
        if (ni != null) bump(3, ni) // norm
      }
      // sub-token analyzer: maximal [a-z0-9]+ runs within the token
      j = 0
      while (j < lt.length) {
        while (j < lt.length && !isAlnum(lt.charAt(j))) j += 1
        val st = j
        while (j < lt.length && isAlnum(lt.charAt(j))) j += 1
        if (j > st) {
          tokLen += 1
          val pi = qwIdx.get(lt.substring(st, j))
          if (pi != null) bump(4, pi) // tok
        }
      }
      // phrase shingles: assemble the bigram only on a head hit
      if (i + 1 < nTok && qbHeads.contains(lt)) {
        val bi = qbIdx.get(lt + " " + toks.get(i + 1))
        if (bi != null) cnt(5 * nW + bi) += 1 // ph2
      }
      i += 1
    }
    // planes 0..4 hold name/exact/desc/norm/tok; emit with the
    // public fid codes, deriving kw (fid 3) from the desc plane
    val posts = new java.util.ArrayList[Any]
    @inline def emit(fid: Int, tid: Int, tf: Int): Unit =
      posts.add(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](fid, tid, tf)))
    val planeFid = Array(FID_NAME, FID_EXACT, FID_DESC, FID_NORM, FID_TOK)
    var p = 0
    while (p < 5) {
      var t = 0
      while (t < nW) {
        val c = cnt(p * nW + t)
        if (c > 0) {
          emit(planeFid(p), t, c)
          if (p == 2 && c >= 3) emit(FID_KW, t, 1)
        }
        t += 1
      }
      p += 1
    }
    var b = 0
    while (b < nB) {
      val c = cnt(5 * nW + b)
      if (c > 0) emit(FID_PH2, b, c)
      b += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        math.min(8L, nTok.toLong), nTok.toLong, normLen, tokLen,
        math.max(nTok.toLong - 1L, 0L),
        new GenericArrayData(posts.toArray)))
  }
}

/** [[SearchAnalyzeUtil.analyze]] as a codegen'd unary expression: the
  * query vocabulary is a plan literal (fixed at build time), carried
  * as two index maps plus the bigram-head set in the generated
  * class. */
case class SearchAnalyzeExpr(child: Expression,
    qWords: Seq[String], qBigrams: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = SearchAnalyzeExpr.schema
  override def prettyName: String = "search_analyze"

  @transient private lazy val qwIdx = {
    val m = new java.util.HashMap[String, Integer]()
    qWords.zipWithIndex.foreach { case (w, i) => m.put(w, i) }
    m
  }
  @transient private lazy val qbIdx = {
    val m = new java.util.HashMap[String, Integer]()
    qBigrams.zipWithIndex.foreach { case (b, i) => m.put(b, i) }
    m
  }
  @transient private lazy val qbHeads = {
    val s = new java.util.HashSet[String]()
    qBigrams.foreach(b => s.add(b.substring(0, b.indexOf(' '))))
    s
  }

  override def nullSafeEval(input: Any): Any =
    SearchAnalyzeUtil.analyze(
      input.asInstanceOf[UTF8String], qwIdx, qbIdx, qbHeads)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode = {
    val qw = ctx.addReferenceObj("qwIdx", qwIdx)
    val qb = ctx.addReferenceObj("qbIdx", qbIdx)
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
    StructField("posts", ArrayType(StructType(Seq(
      StructField("fid", IntegerType, nullable = false),
      StructField("tid", IntegerType, nullable = false),
      StructField("tf", IntegerType, nullable = false))),
      containsNull = false), nullable = false)))
}
