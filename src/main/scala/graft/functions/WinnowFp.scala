package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass winnowing fingerprint kernel (Schleimer et al. 2003): k-gram
  * md5-prefix hashes + sliding-window rightmost-minimum selection, emitted
  * as `array<struct<pos bigint, fp bigint>>` of the distinct selected
  * fingerprints. Replaces the declarative explode → window-min → distinct
  * formulation (one shuffle + |text| exploded rows) with a map-only
  * monotonic-deque scan: O(|text|) time, O(w) deque memory per document.
  *
  * The gram hash is EXACTLY the engine-portable value the declarative
  * form computed — md5 of the UTF-8 bytes of the k-codepoint substring,
  * first 15 hex digits as an integer (== the big-endian first 8 digest
  * bytes >>> 4) — so DuckDB oracles replay it unchanged.
  *
  * Interpreted eval is a tight primitive loop over one document;
  * CodegenFallback costs only the per-row call (the MinHashSig pattern).
  */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && w > 0)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", LongType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // codepoint start offsets (Spark substring counts codepoints, and the
    // oracle's DuckDB substr does too — UTF-16 indexing would diverge on
    // supplementary-plane text)
    val len = s.length
    var cpCount = 0
    var i = 0
    while (i < len) { cpCount += 1; i += Character.charCount(s.codePointAt(i)) }
    val offs = new Array[Int](cpCount + 1)
    i = 0; var c = 0
    while (i < len) { offs(c) = i; c += 1; i += Character.charCount(s.codePointAt(i)) }
    offs(cpCount) = len
    val n = cpCount - (k - 1)
    if (n < w) return new GenericArrayData(Array.empty[Any])

    val md = WinnowFp.digest.get()
    val hs = new Array[Long](n)
    i = 0
    while (i < n) {
      md.reset()
      val bytes = s.substring(offs(i), offs(i + k)).getBytes(WinnowFp.utf8)
      val d = md.digest(bytes)
      // first 15 hex chars == big-endian first 8 bytes >>> 4
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = v >>> 4
      i += 1
    }
    // monotonic deque of indices, h strictly increasing front->back; equal
    // hashes keep the NEWER index (rightmost-min tie rule). Front index is
    // non-decreasing, so consecutive-dedup yields the distinct selection.
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    val out = new scala.collection.mutable.ArrayBuffer[Any](2 * n / (w + 1) + 2)
    var lastSel = -1
    var e = 0
    while (e < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(e)) tail -= 1
      deque(tail) = e; tail += 1
      val start = e - w + 1
      if (start >= 0) {
        while (deque(head) < start) head += 1
        val selected = deque(head)
        if (selected != lastSel) {
          out += new GenericInternalRow(
            Array[Any]((selected + 1).toLong, hs(selected)))
          lastSel = selected
        }
      }
      e += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFp {
  private val utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Fingerprint array column from a string column. */
  def apply(text: Column, k: Int, w: Int): Column =
    GraftBridge.col(WinnowFp(GraftBridge.expr(text), k, w))
}
