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

/** BERT-style MLM masking (Devlin et al. 2018 §3.1): select `ratePct`% of
  * tokens; of those, 80% become `[MASK]`, 10% are replaced with a random
  * token, 10% stay unchanged; the label stream records the original token
  * at every selected position.
  *
  * All three draws are md5 buckets of `"<id>:<pos>[:<salt>]"` — fully
  * deterministic (reruns and engines agree; same sampleBucket convention
  * as [[SpanCorrupt]], so the whole construction replays in SQL). The
  * "random" replacement is drawn from the DOCUMENT's own tokens — a
  * documented simplification vs BERT's corpus-vocabulary draw, which
  * would need a broadcast vocabulary for no extra test coverage.
  *
  * One pass per row, map-only. Output: struct(masked, labels, n_masked)
  * with labels as `pos=token` pairs in position order.
  */
case class MlmMask(left: Expression, right: Expression, ratePct: Int)
    extends BinaryExpression with CodegenFallback {
  require(ratePct >= 1 && ratePct <= 99, "mask rate must be in [1, 99] pct")

  override def dataType: DataType = StructType(Seq(
    StructField("masked", StringType, nullable = false),
    StructField("labels", StringType, nullable = false),
    StructField("n_masked", IntegerType, nullable = false)))
  override def prettyName: String = "mlm_mask"

  override protected def nullSafeEval(toks: Any, id: Any): Any = {
    val arr = toks.asInstanceOf[ArrayData]
    val key = id.asInstanceOf[UTF8String].toString
    val md = MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new StringBuilder
    val labels = new StringBuilder
    var masked = 0
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i).toString
      val piece =
        if (bucket(md, s"$key:$i") % 100 < ratePct) {
          masked += 1
          if (labels.nonEmpty) labels += ' '
          labels ++= s"$i=$tok"
          val act = bucket(md, s"$key:$i:act") % 10
          if (act < 8) "[MASK]"
          else if (act == 8)
            arr.getUTF8String((bucket(md, s"$key:$i:rnd") % n).toInt).toString
          else tok
        } else tok
      if (out.nonEmpty) out += ' '
      out ++= piece
      i += 1
    }
    InternalRow(
      UTF8String.fromString(out.toString),
      UTF8String.fromString(labels.toString), masked)
  }

  /** First 8 hex chars of md5 as an unsigned value — the q82 sampleBucket
    * convention (`('0x' || substr(md5(k),1,8))::BIGINT`). */
  private def bucket(md: MessageDigest, key: String): Long = {
    md.reset()
    val d = md.digest(key.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 4) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MlmMask {
  /** struct(masked, labels, n_masked) from a token array + row-id string. */
  def apply(tokens: Column, id: Column, ratePct: Int = 15): Column =
    org.apache.spark.sql.GraftBridge.col(MlmMask(
      org.apache.spark.sql.GraftBridge.expr(tokens),
      org.apache.spark.sql.GraftBridge.expr(id), ratePct))
}
