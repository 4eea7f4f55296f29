package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** T5-style span corruption (Raffel et al. 2020 §3.1.4): mask token spans,
  * replace each masked run with a sentinel in the encoder input, and emit
  * the masked runs behind their sentinels as the decoder target — the
  * denoising objective's data-preparation step.
  *
  *   tokens:  the cat sat on the mat
  *   masked:      ███ ███        ███
  *   input:   the <extra_id_0> on the <extra_id_1>
  *   target:  <extra_id_0> cat sat <extra_id_1> mat <extra_id_2>
  *
  * Token i is masked when the md5 bucket of `"<id>:<i>"` falls under
  * `ratePct` — deterministic (reruns and engines agree; the same
  * `('0x' || substr(md5(k),1,8))::BIGINT % 100` rule replays in SQL, the
  * q82 sampleBucket convention), and i.i.d. per token so masked runs have
  * the geometric lengths the objective expects. The final target sentinel
  * terminator follows the T5 convention.
  *
  * One pass per row, map-only — no per-token explode/shuffle. Output:
  * struct(input, target, n_spans).
  */
case class SpanCorrupt(left: Expression, right: Expression, ratePct: Int)
    extends BinaryExpression with CodegenFallback {
  require(ratePct >= 1 && ratePct <= 99, "mask rate must be in [1, 99] pct")

  override def dataType: DataType = StructType(Seq(
    StructField("input", StringType, nullable = false),
    StructField("target", StringType, nullable = false),
    StructField("n_spans", IntegerType, nullable = false)))
  override def prettyName: String = "t5_span_corrupt"

  override protected def nullSafeEval(toks: Any, id: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val key = id.asInstanceOf[UTF8String].toString
    val md = MessageDigest.getInstance("MD5")
    val in = new StringBuilder
    val tgt = new StringBuilder
    var spans = 0
    var prevMasked = false
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val tok = arr.getUTF8String(i).toString
      if (masked(md, s"$key:$i")) {
        if (!prevMasked) {
          if (in.nonEmpty) in += ' '
          in ++= s"<extra_id_$spans>"
          if (tgt.nonEmpty) tgt += ' '
          tgt ++= s"<extra_id_$spans>"
          spans += 1
        }
        tgt += ' '; tgt ++= tok
        prevMasked = true
      } else {
        if (in.nonEmpty) in += ' '
        in ++= tok
        prevMasked = false
      }
      i += 1
    }
    // T5 terminator sentinel after the last target span
    if (spans > 0) {
      if (tgt.nonEmpty) tgt += ' '
      tgt ++= s"<extra_id_$spans>"
    }
    InternalRow(
      UTF8String.fromString(in.toString),
      UTF8String.fromString(tgt.toString), spans)
  }

  /** Same bucket rule as TextAnalysis.sampleBucket: first 8 hex chars of
    * md5, parsed base-16, mod 100. */
  private def masked(md: MessageDigest, key: String): Boolean = {
    md.reset()
    val d = md.digest(key.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v % 100 < ratePct
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SpanCorrupt {
  /** struct(input, target, n_spans) from a token array + row-id string. */
  def apply(tokens: Column, id: Column, ratePct: Int = 15): Column =
    org.apache.spark.sql.GraftBridge.col(SpanCorrupt(
      org.apache.spark.sql.GraftBridge.expr(tokens),
      org.apache.spark.sql.GraftBridge.expr(id), ratePct))
}
