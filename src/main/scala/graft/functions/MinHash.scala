package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** MinHash signature over a shingle set, as a single-pass native expression.
  *
  * Broder minhash: each of `numHashes` hash permutations keeps its minimum
  * over the document's shingles. Instead of `numHashes` independent string
  * hashes per shingle, each shingle is xxhash64'd once and the permutations
  * are affine maps `a_i * h + b_i` over Z_2^64 (a_i odd ⇒ bijective) with
  * deterministic seeded coefficients — the standard tabulation-free
  * construction (same scheme as Spark MLlib's MinHashLSH, reduced mod-prime
  * there). One array scan per row; O(|shingles| + 64·|shingles|) multiply-adds.
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

  // Deterministic permutation coefficients (fixed seed: stable signatures
  // across runs/executors, the property the reference gets from its fixed
  // sketch seed — df_operator/src/udfs/thetasketch_distinct.rs:59-80).
  @transient private lazy val coeffs: (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(0x5eed5eedL)
    val a = Array.fill(numHashes)(rnd.nextLong() | 1L)
    val b = Array.fill(numHashes)(rnd.nextLong())
    (a, b)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (as, bs) = coeffs
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
      var j = 0
      while (j < numHashes) {
        val g = as(j) * h + bs(j)
        if (g < mins(j)) mins(j) = g
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
  /** Signature column from an array&lt;string&gt; shingle column. */
  def apply(shingles: Column, numHashes: Int): Column =
    GraftBridge.col(MinHashSig(GraftBridge.expr(shingles), numHashes))
}
