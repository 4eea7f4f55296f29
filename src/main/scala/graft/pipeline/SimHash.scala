package graft.pipeline

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Charikar SimHash over a token array: each token hashes to `Bits` bits;
  * per bit position, +1 if set else -1 across tokens; the fingerprint's bit
  * is 1 where the sum is positive. Near-duplicate docs land within a few
  * bits of Hamming distance.
  *
  * ENGINE-PORTABLE (round 5): the token hash is the md5-prefix-60 integer
  * (`('0x' || substr(md5(t),1,15))::BIGINT` in SQL — the same base hash as
  * the portable minhash family), so the fingerprint is 60-bit and every
  * draw is replayable in plain SQL; banding becomes 4 × 15 bits, which
  * keeps the pigeonhole guarantee for maxHamming ≤ 3. What 4 fewer bits
  * cost: nothing structural — simhash precision scales smoothly with
  * width, and the planted-near-dup recall spec binds the behavior.
  *
  * Native expression with codegen (single static call) — this runs once per
  * document over the full corpus, so it must stay inside WholeStageCodegen.
  */
object SimHashUtil {
  /** Fingerprint width in bits (60 = the md5-prefix integer's width). */
  val Bits = 60

  /** md5-prefix-60 of the token's UTF-8 bytes — stable across JVMs AND
    * replayable in SQL (the portability property murmur3 lacked). */
  def tokenHash(bytes: Array[Byte]): Long =
    graft.functions.MinHashSig.md5PrefixBytes(bytes, 15)

  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < Bits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < Bits) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

case class SimHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.SimHashUtil.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  /** simhash64 over an array<string> token column. */
  def simhash64(tokens: Column): Column =
    GraftBridge.col(SimHash(GraftBridge.expr(tokens)))
}
