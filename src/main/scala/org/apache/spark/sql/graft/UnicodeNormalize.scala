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
