package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType,
  DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word n-gram shingling. The declarative alternatives both
  * pay real costs at corpus scale: interpreted higher-order folds
  * (transform/slice) run ~10x slower than codegen, and the
  * posexplode + lead-window form shuffles and sorts every TOKEN of
  * the corpus by doc before a single shingle exists. This expression
  * emits the full shingle array per document inside whole-stage
  * codegen — the dedup pipelines then explode it with zero extra
  * shuffles.
  *
  * Semantics are identical to `tokens(lower(text))` n-grams
  * (split on `\s+`, drop empty tokens, docs shorter than one shingle
  * emit an empty array), so the existing DuckDB oracles are
  * untouched. Lowercasing uses Locale.ROOT so a host JVM locale
  * (tr_TR dotless-i) can never change results. Known cross-engine
  * caveat shared with Spark's own `lower`: the JDK applies the
  * Unicode Final_Sigma rule (ΤΕΛΟΣ → τελος with ς) where utf8proc
  * engines map Σ → σ unconditionally — Greek-final-sigma corpora
  * would need a simple-casefold expression on both sides.
  */
object ShingleUtil {
  // hoisted: String.split("\\s+") would Pattern.compile per document
  private val WS = java.util.regex.Pattern.compile("\\s+")

  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = WS.split(
      text.toString.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Per-vector scalar quantization of an `array<double>` embedding to
  * `levels` uniform codes, emitted as a CSV string — the storage/
  * transport form for embeddings at corpus scale (64 float64 dims →
  * 64 bytes). One codegen'd pass, no higher-order functions.
  *
  * Arithmetic is plain IEEE (`floor((x-min)/(max-min)*(levels-1) +
  * 0.5)`) over values any engine reads identically from parquet, so
  * an oracle reproduces the exact codes with the same formula —
  * no decimal-vs-binary rounding boundary exists because nothing is
  * rounded to a decimal place. A constant vector (max == min)
  * quantizes to all-zero codes.
  */
object QuantizeUtil {
  def quantizeCsv(vec: ArrayData, levels: Int): UTF8String = {
    val n = vec.numElements()
    var mn = Double.MaxValue
    var mx = -Double.MaxValue
    var i = 0
    while (i < n) {
      // SQL-exposed: ArrayData.getDouble on a null slot silently
      // reads garbage — fail descriptively instead
      if (vec.isNullAt(i)) throw new IllegalArgumentException(
        s"quantize_csv: null element at index $i")
      val x = vec.getDouble(i)
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    val span = mx - mn
    val sb = new java.lang.StringBuilder(n * 4)
    i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      val code = if (span > 0)
        math.floor((vec.getDouble(i) - mn) / span * (levels - 1) + 0.5)
          .toLong
      else 0L
      sb.append(code)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** [[QuantizeUtil.quantizeCsv]] as a codegen'd unary expression. */
case class QuantizeCsv(child: Expression, levels: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(levels >= 2, s"levels must be >= 2, got $levels")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = StringType
  override def prettyName: String = "quantize_csv"

  override def nullSafeEval(input: Any): Any =
    QuantizeUtil.quantizeCsv(input.asInstanceOf[ArrayData], levels)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.QuantizeUtil.quantizeCsv($c, $levels)")

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}

/** [[ShingleUtil.shingles]] as a codegen'd unary expression:
  * `word_shingles(text, n)` → array of space-joined lowercase word
  * n-grams. */
case class WordShinglesExpr(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.ShingleUtil.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}

/** One-pass char-trigram extraction as PACKED LONG codes: each
  * trigram of Unicode code points (c1,c2,c3) becomes
  * `c1<<42 | c2<<21 | c3` (21 bits per code point covers U+10FFFF;
  * three fit a positive long). The encoding is injective, so every
  * count, group and conditional-probability ratio downstream is
  * IDENTICAL to grouping by the substring form — while the hot path
  * shuffles and hashes 8-byte longs instead of allocating millions
  * of 3-char UTF8Strings (t09's model+score passes measured ~35%
  * faster). The bigram prefix is `code >>> 21` — no second string
  * op. Inputs shorter than 3 code points emit an empty array,
  * mirroring the `length(s) >= 3` oracle guard.
  */
object TrigramUtil {
  def trigramCodes(text: UTF8String): ArrayData = {
    val s = text.toString
    var i = 0
    var k = 0
    val cps = new Array[Int](s.length)
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    if (k < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](k - 2)
    var j = 0
    while (j < k - 2) {
      out(j) = (cps(j).toLong << 42) | (cps(j + 1).toLong << 21) |
        cps(j + 2).toLong
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** [[TrigramUtil.trigramCodes]] as a codegen'd unary expression. */
case class CharTrigramCodes(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "char_trigram_codes"

  override def nullSafeEval(input: Any): Any =
    TrigramUtil.trigramCodes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TrigramUtil.trigramCodes($c)")

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}

/** Sequential-batch BPE merge application. A plan is R ROUNDS of
  * token-DISJOINT merge pairs (the batched-greedy learner's output);
  * semantics per round are the space-doubling sequential literal
  * replaces both engines spec (double every space, replace each
  * delimited doubled pair `' a  b '` with `' a_b '` leftmost-
  * non-overlapping in batch order, collapse doubles) — the DuckDB
  * oracle applies exactly that fold via list_reduce.
  *
  * The hot path exploits within-round disjointness: because fusing
  * `a b` can neither create nor destroy an occurrence of `c d` when
  * {a,b} ∩ {c,d} = ∅, the whole batch equals ONE left-to-right token
  * scan (fuse when the adjacent pair is in the round's hash set,
  * then skip both tokens — which also reproduces the leftmost rule
  * for self-adjacent pairs: `a a a` fuses only the first two). That
  * makes a round O(len) instead of O(merges·len), which is what lets
  * the learner carry hundreds of merges without the corpus scan
  * degrading — the nested-replace form this replaces grew one full
  * string pass per accepted merge. Inputs not in canonical shape
  * (leading+trailing single space, single spaces between nonempty
  * tokens — everything the q63/t23 normalizer emits) take the
  * literal replace-chain fallback so the expression equals the spec
  * on EVERY input, not just well-formed ones (spec fuzz-pins fast ==
  * fallback on canonical corpora). */
final class BpePlan(val rounds: Array[Array[String]])
  extends Serializable {
  // pair "a b" -> fused "a_b"; rebuilt per executor after serialize
  @transient lazy val maps: Array[java.util.HashMap[String, String]] =
    rounds.map { ps =>
      val m = new java.util.HashMap[String, String](ps.length * 2)
      ps.foreach { p =>
        val i = p.indexOf(' ')
        require(i > 0 && p.indexOf(' ', i + 1) < 0,
          s"merge pair must be two space-separated tokens: '$p'")
        m.put(p, p.substring(0, i) + "_" + p.substring(i + 1))
      }
      m
    }
}

object BpeUtil {
  private def canonical(s: String): Boolean =
    s.length >= 2 && s.charAt(0) == ' ' &&
      s.charAt(s.length - 1) == ' ' && !s.contains("  ")

  def applyRounds(text: UTF8String, plan: BpePlan): UTF8String = {
    var s = text.toString
    var r = 0
    while (r < plan.rounds.length) {
      if (canonical(s)) {
        // one token scan per round (disjoint batch == single pass)
        val m = plan.maps(r)
        val toks = s.substring(1, s.length - 1).split(" ", -1)
        val sb = new java.lang.StringBuilder(s.length + 1)
        sb.append(' ')
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length) {
            val fused = m.get(toks(i) + " " + toks(i + 1))
            if (fused != null) {
              sb.append(fused).append(' ')
              i += 2
            } else {
              sb.append(toks(i)).append(' ')
              i += 1
            }
          } else {
            sb.append(toks(i)).append(' ')
            i += 1
          }
        }
        s = sb.toString
      } else {
        // exact spec fallback: doubled-space sequential replaces
        var t = s.replace(" ", "  ")
        plan.rounds(r).foreach { p =>
          t = t.replace(" " + p.replace(" ", "  ") + " ",
            " " + p.replace(' ', '_') + " ")
        }
        s = t.replace("  ", " ")
      }
      r += 1
    }
    UTF8String.fromString(s)
  }
}

/** [[BpeUtil.applyRounds]] as a codegen'd unary expression; the plan
  * rides as a referenced object (rebuilding its per-round hash maps
  * lazily on each executor), so hundreds of merges never appear in
  * the expression tree or the generated source. */
case class BpeApplyExpr(child: Expression, rounds: Seq[Seq[String]])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_apply"

  @transient private lazy val plan =
    new BpePlan(rounds.map(_.toArray).toArray)

  override def nullSafeEval(input: Any): Any =
    BpeUtil.applyRounds(input.asInstanceOf[UTF8String], plan)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode = {
    val ref = ctx.addReferenceObj("bpePlan", plan,
      classOf[BpePlan].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BpeUtil.applyRounds($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}
