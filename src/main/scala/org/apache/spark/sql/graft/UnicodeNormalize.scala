package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NFC Unicode normalization as a codegen'd expression — Spark has no
  * builtin for it. The reference pipeline normalizes every candidate
  * name before hashing/deduping (create_merged.py:163
  * configure_force_normalize, load_custom_collections.py:187
  * force_normalize); without a canonical form, visually identical
  * names hash differently and dedup silently misses.
  *
  * DuckDB's `nfc_normalize` computes the identical transform, so
  * queries built on this stay oracle-comparable.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.NFC))""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}

/** Confusable-skeleton + emoji/ZWJ strip — a public-knowledge subset
  * of the UTS-39 skeleton transform that the reference's
  * force_normalize applies via the ens-normalize standard
  * (load_custom_collections.py:187, create_merged.py:163): visually
  * confusable codepoints (Cyrillic/Greek homoglyphs, fullwidth forms)
  * map to their Latin skeleton, and emoji / zero-width joiners /
  * variation selectors are stripped, after NFC. Without this, a name
  * spoofed with U+0430 CYRILLIC SMALL A hashes differently from its
  * Latin twin and dedup/uniqueness checks silently miss.
  *
  * The mapping is a fixed 1:1-codepoint table ([[Skeletonize.confusables]])
  * so any engine can mirror it exactly:
  * `translate(regexp_replace(nfc_normalize(x), <strip-class>, ''), from, to)`.
  */
object Skeletonize {
  /** 1:1 BMP codepoint confusable map (UTS-39 subset, stable):
    * Cyrillic + Greek homoglyphs, fullwidth Latin letters and digits. */
  val confusables: Seq[(Char, Char)] = Seq(
    'а' -> 'a', 'е' -> 'e', 'о' -> 'o', 'р' -> 'p',
    'с' -> 'c', 'х' -> 'x', 'у' -> 'y', 'і' -> 'i',
    'ѕ' -> 's', 'ј' -> 'j',
    'ο' -> 'o', 'ν' -> 'v') ++
    (0 until 26).map(i => (('ａ' + i).toChar, ('a' + i).toChar)) ++
    (0 until 10).map(i => (('０' + i).toChar, ('0' + i).toChar))

  private val charMap: Map[Char, Char] = confusables.toMap

  /** Zero-width controls, variation selector 16, and the main emoji /
    * symbol blocks. Kept to codepoint ranges a regex class can mirror. */
  def stripped(cp: Int): Boolean =
    cp == 0x200B || cp == 0x200C || cp == 0x200D || cp == 0xFE0F ||
      (cp >= 0x2600 && cp <= 0x27BF) || (cp >= 0x1F000 && cp <= 0x1FAFF)

  /** RE2-compatible character class matching [[stripped]] — for
    * oracle mirrors. */
  val stripClass: String =
    "[\\x{200B}\\x{200C}\\x{200D}\\x{FE0F}" +
      "\\x{2600}-\\x{27BF}\\x{1F000}-\\x{1FAFF}]"

  def skeleton(s: String): String = {
    val nfc = Normalizer.normalize(s, Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(nfc.length)
    var i = 0
    while (i < nfc.length) {
      val cp = nfc.codePointAt(i)
      if (!stripped(cp)) {
        if (cp <= 0xFFFF) sb.append(charMap.getOrElse(cp.toChar, cp.toChar))
        else sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }
}

/** [[Skeletonize.skeleton]] as a codegen'd unary expression — stays
  * inside whole-stage codegen like [[NfcNormalize]]. */
case class ConfusableSkeleton(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "confusable_skeleton"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Skeletonize.skeleton(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  org.apache.spark.sql.graft.Skeletonize.skeleton(
         |    $c.toString()))""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}
