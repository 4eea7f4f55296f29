package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined paragraph chunking for paragraph-level (CCNet-style)
  * dedup. The corpus fixture is a single-space word stream with no
  * newline structure, so paragraph boundaries are derived from CONTENT:
  * a boundary falls AFTER every token whose md5 first byte satisfies
  * `byte % grain == 0` (expected paragraph length ≈ `grain` tokens).
  *
  * Content-defined boundaries are the point: a passage copied between
  * two documents chunks into the SAME paragraphs regardless of its
  * offset in either document (the CDC trick from dedup storage systems),
  * so exact paragraph-hash matching finds cross-document boilerplate
  * that fixed-size positional windows would miss whenever the copies
  * are shifted.
  *
  * One pass per row, map-only, no shuffle: downstream callers hash each
  * paragraph map-side and never shuffle paragraph text. The boundary
  * hash replays in SQL as `('0x' || substr(md5(tok), 1, 2))::INT %
  * grain = 0` (the established md5 replay convention), so a DuckDB
  * oracle can derive identical paragraphs.
  *
  * Full `doGenCode` (one static call into [[CdcParagraphs.cut]]) — no
  * CodegenFallback, so the chunking projection stays inside whole-stage
  * codegen (the PslDomain lesson, SCALING §8.13).
  */
case class CdcParagraphs(child: Expression, grain: Int)
    extends UnaryExpression {
  require(grain >= 2, "grain must be >= 2 (1 would cut after every token)")
  // the boundary rule reads ONE md5 byte, so grain > 256 would silently
  // behave as grain 256 (byte % 512 == 0 iff byte == 0) — in the kernel
  // AND the SQL oracle twin, so no gate could catch the degradation
  require(grain <= 256, "grain must be <= 256 (boundary rule reads one md5 byte)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_paragraphs"

  override protected def nullSafeEval(text: Any): Any =
    CdcParagraphs.cut(text.asInstanceOf[UTF8String], grain)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CdcParagraphs.cut($c, $grain)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcParagraphs {
  /** Array of content-defined paragraphs (single-space re-joined). */
  def apply(text: Column, grain: Int = 8): Column =
    org.apache.spark.sql.GraftBridge.col(CdcParagraphs(
      org.apache.spark.sql.GraftBridge.expr(text), grain))

  /** Per-thread digest — getInstance per ROW costs in a hot map path
    * (the round-6 MinHash lesson). */
  private val localMd5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** JVM kernel (called from generated code via the static forwarder).
    * Same tokenization as the battery's tokens(): split(trim(text),
    * \s+) — an empty/blank doc yields one empty token, hence one empty
    * paragraph, matching string_split_regex(trim(text), '\s+'). */
  def cut(text: UTF8String, grain: Int): ArrayData = {
    val toks = text.toString.trim.split("\\s+")
    val md = localMd5.get()
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val cur = new StringBuilder
    var i = 0
    while (i < toks.length) {
      if (cur.nonEmpty) cur += ' '
      cur ++= toks(i)
      if (isBoundary(md, toks(i), grain)) {
        out += UTF8String.fromString(cur.toString)
        cur.clear()
      }
      i += 1
    }
    if (cur.nonEmpty || out.isEmpty) out += UTF8String.fromString(cur.toString)
    new GenericArrayData(out.toArray[Any])
  }

  /** md5 first byte (= first two hex chars) mod grain == 0. */
  private def isBoundary(md: MessageDigest, tok: String, grain: Int): Boolean = {
    md.reset()
    val d = md.digest(tok.getBytes(StandardCharsets.UTF_8))
    (d(0) & 0xff) % grain == 0
  }
}
