package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over a shingle set, as a single-pass native expression.
  *
  * Broder minhash: each of `numHashes` hash permutations keeps its minimum
  * over the document's shingles. Instead of `numHashes` independent string
  * hashes per shingle, each shingle is base-hashed once and the permutations
  * are affine maps `a_i * h + b_i` over Z_2^64 (a_i odd ⇒ bijective) —
  * the standard tabulation-free construction (same scheme as Spark MLlib's
  * MinHashLSH, reduced mod-prime there). One array scan per row;
  * O(|shingles| + 64·|shingles|) multiply-adds.
  *
  * ENGINE-PORTABLE since round 5 (the q194-winnowing trick, which is what
  * lets the LSH dedup queries be DuckDB-oracle-checked):
  *   - base hash  h  = md5-prefix-60 of the shingle
  *                     (`('0x' || substr(md5(s),1,15))::BIGINT` in SQL);
  *   - coefficients derive from md5 too, not a JVM RNG:
  *       a_j = 2·md5p28("mh:a:"+j) + 1   (odd, < 2^29)
  *       b_j = md5p60("mh:b:"+j)
  *     so a_j·h + b_j < 2^90 — replayable exactly in 128-bit SQL
  *     arithmetic as `(a::HUGEINT * h + b) % 2^64`;
  *   - the slot minimum is UNSIGNED (Long.compareUnsigned here, natural
  *     HUGEINT order on the mod-2^64 value in SQL).
  *
  * Replaces a higher-order-function formulation (`transform(sequence(0,63),
  * i -> aggregate(shingles, ...))`) that re-evaluated the whole shingle
  * construction per hash slot in interpreted mode — ~500× slower.
  *
  * Runs once per document on the dedup path; interpreted eval is a tight
  * primitive loop, so CodegenFallback costs only the per-row call.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with CodegenFallback {
  require(numHashes > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    val a = Array.tabulate(numHashes)(j => 2L * MinHashSig.md5Prefix(s"mh:a:$j", 7) + 1L)
    val b = Array.tabulate(numHashes)(j => MinHashSig.md5Prefix(s"mh:b:$j", 15))
    (a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (as, bs) = coeffs
    // unsigned min; -1L is the unsigned maximum
    val mins = Array.fill(numHashes)(-1L)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = MinHashSig.md5Prefix60(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < numHashes) {
        val g = as(j) * h + bs(j) // wraps mod 2^64, matching the SQL replay
        if (java.lang.Long.compareUnsigned(g, mins(j)) < 0) mins(j) = g
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  // One MessageDigest per task thread: getInstance("MD5") is a provider
  // lookup + allocation, and this runs once per shingle of every row of
  // the corpus-wide signature pass (q55/q199/q258, simhash token hash).
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nHex` hex chars of md5(bytes) as a non-negative Long —
    * identical to SQL's `('0x' || substr(md5(s), 1, nHex))::BIGINT`. */
  def md5PrefixBytes(bytes: Array[Byte], nHex: Int): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < nHex) {
      val nib = if (i % 2 == 0) (d(i / 2) >>> 4) & 0xF else d(i / 2) & 0xF
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  def md5Prefix(s: String, nHex: Int): Long =
    md5PrefixBytes(s.getBytes("UTF-8"), nHex)

  /** 60-bit base hash of a shingle (15 hex chars). */
  def md5Prefix60(bytes: Array[Byte]): Long = md5PrefixBytes(bytes, 15)

  /** Signature column from an array&lt;string&gt; shingle column. */
  def apply(shingles: Column, numHashes: Int): Column =
    GraftBridge.col(MinHashSig(GraftBridge.expr(shingles), numHashes))
}
