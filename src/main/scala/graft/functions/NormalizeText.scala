package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** CCNet-style text canonicalization in one pass (Wenzek et al. 2020 §3.1
  * normalize before hashing): Unicode normalization form, ROOT-locale
  * lowercasing, combining-mark (accent) stripping, digit→0 folding. Used
  * ahead of fingerprinting / MinHash so "Café 2024" and "cafe 0000"
  * variants of a paragraph hash identically.
  *
  * Map-only scalar expression — runs at scan speed inside the projection;
  * no UDF/serde boundary. Options are plan-time constants so the compiled
  * pipeline is branch-free per row.
  */
case class NormalizeText(child: Expression, form: String,
    lowercase: Boolean, stripAccents: Boolean, digitsToZero: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)
  @transient private lazy val marks = java.util.regex.Pattern.compile("\\p{M}+")
  @transient private lazy val digits = java.util.regex.Pattern.compile("\\p{Nd}")

  override protected def nullSafeEval(input: Any): Any = {
    var s = Normalizer.normalize(input.asInstanceOf[UTF8String].toString, normForm)
    if (lowercase) s = s.toLowerCase(java.util.Locale.ROOT)
    if (stripAccents) {
      // decompose so precomposed accents become combining marks, strip them
      s = marks.matcher(Normalizer.normalize(s, Normalizer.Form.NFD))
        .replaceAll("")
      // restore the requested composition form after surgery
      if (normForm != Normalizer.Form.NFD && normForm != Normalizer.Form.NFKD)
        s = Normalizer.normalize(s, normForm)
    }
    if (digitsToZero) s = digits.matcher(s).replaceAll("0")
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  /** CCNet defaults: NFKC + lowercase + accent strip + digits→0. */
  def apply(text: Column, form: String = "NFKC", lowercase: Boolean = true,
      stripAccents: Boolean = true, digitsToZero: Boolean = true): Column =
    org.apache.spark.sql.GraftBridge.col(NormalizeText(
      org.apache.spark.sql.GraftBridge.expr(text),
      form, lowercase, stripAccents, digitsToZero))
}
