package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** ENGINE-PORTABLE sign-random-projection LSH signatures (Charikar
  * sign-LSH with Rademacher ±1 hyperplanes, Achlioptas 2001): for table
  * `t`, bit `j`, dimension `d` the hyperplane weight is ±1 derived from
  * the parity of the first md5 nibble of the string "rp:t:j:d", and the
  * projected value is the INTEGER dot product over components quantized
  * to 1e-6 (HALF_UP). Every draw is therefore replayable in plain SQL on
  * any engine with md5 — the q194-winnowing portability trick applied to
  * embedding LSH, which is what lets the LSH near-dup/ANN queries be
  * DuckDB-oracle-checked instead of rows-only:
  *
  *   sign(t,j,d)  = ('0x' || substr(md5('rp:'||t||':'||j||':'||d),1,1))::INT % 2
  *                  = 0 → +1 else −1
  *   q(d)         = CAST(round(emb[d] * 1e6) AS BIGINT)
  *   dot(t,j)     = Σ_d q(d)·sign(t,j,d)        (exact integer, order-free)
  *   key(t)       = Σ_j (dot(t,j) > 0) · 2^j
  *
  * Integer quantization is the determinism move: a float dot's last ulp
  * depends on summation order, and a sign flip at the boundary would
  * silently change the candidate set between engines; the integer dot is
  * exact in both. The 1e-6 grid costs nothing measurable in recall
  * (components are O(1); a boundary flip needs |dot| < dim·5e-7).
  */
case class RademacherSigExpr(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression with CodegenFallback {
  require(tables > 0 && bits > 0 && bits < 63)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rademacher_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val elems = child.dataType.asInstanceOf[ArrayType].elementType
    val n = arr.numElements()
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      v(d) = elems match {
        case FloatType  => arr.getFloat(d).toDouble
        case DoubleType => arr.getDouble(d)
        case _          => arr.get(d, elems).toString.toDouble
      }
      d += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      RademacherSig.signatureOfVec(v, tables, bits))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RademacherSig {
  /** ±1 sign for (table, bit, dim) — md5-nibble parity, see scaladoc. */
  def sign(table: Int, bit: Int, dim: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"rp:$table:$bit:$dim".getBytes("UTF-8"))
    if (((h(0) >>> 4) & 0x1) == 0) 1 else -1
  }

  // sign matrices are small (tables·bits·dim booleans) and immutable: one
  // lazily-built copy per (tables, bits, dim) per JVM, shared across rows
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Int), Array[Array[Int]]]()
  private def signs(tables: Int, bits: Int, dim: Int): Array[Array[Int]] =
    cache.computeIfAbsent((tables, bits, dim),
      k => Array.tabulate(k._1 * k._2, k._3)(
        (tj, d) => sign(tj / k._2, tj % k._2, d)))

  /** HALF_UP quantization to the 1e-6 grid (matches SQL round()). */
  def quantize(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  def signatureOfVec(v: Array[Double], tables: Int, bits: Int): Array[Long] = {
    val s = signs(tables, bits, v.length)
    val q = new Array[Long](v.length)
    var d = 0
    while (d < v.length) { q(d) = quantize(v(d)); d += 1 }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val row = s(t * bits + j)
        var dot = 0L
        var i = 0
        while (i < v.length) { dot += q(i) * row(i); i += 1 }
        if (dot > 0) key |= (1L << j)
        j += 1
      }
      out(t) = key
      t += 1
    }
    out
  }

  def signature(emb: Column, tables: Int, bits: Int): Column =
    GraftBridge.col(RademacherSigExpr(GraftBridge.expr(emb), tables, bits))
}
