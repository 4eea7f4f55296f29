package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable Misra-Gries frequent-items summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS 2012) —
  * the frequency member of the sketch-rollup triad next to HLL
  * (distinct, [[graft.operators.SketchRollup]]) and t-digest (quantiles,
  * [[TDigestSketch]]): "top user_ids per day, and per month from the SAME
  * precomputation", without the exact groupBy over every key that a
  * 100 TB scan cannot afford.
  *
  * Guarantee: with capacity k, every item's estimate e satisfies
  * `true - N/(k+1) <= e <= true` (N = total stream weight), merges
  * included — so any item with true frequency > N/(k+1) is guaranteed
  * present. Deterministic: decrement applies uniformly, ties in the
  * final top-k are broken by item value.
  */
object MisraGries {

  /** counters + how much has been subtracted overall is not tracked —
    * standard MG state is just the counter map plus total seen weight
    * (for the error bound). */
  final class Summary(val k: Int) {
    val counts = mutable.HashMap.empty[String, Long]
    var total = 0L

    def add(item: String, w: Long = 1L): Unit = {
      total += w
      counts.get(item) match {
        case Some(c) => counts.update(item, c + w)
        case None =>
          counts.update(item, w)
          if (counts.size > k) shrink()
      }
    }

    /** Subtract the (size-k+1)-th largest count from everything and drop
      * non-positive counters — the batched MG decrement (one pass,
      * deterministic). */
    private def shrink(): Unit = {
      val m = counts.values.toArray.sorted.apply(counts.size - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      counts.keysIterator.foreach { key =>
        val c = counts(key) - m
        if (c <= 0) dead += key else counts.update(key, c)
      }
      dead.foreach(counts.remove)
    }

    def mergeIn(o: Summary): Unit = {
      total += o.total
      o.counts.foreach { case (item, w) =>
        counts.get(item) match {
          case Some(c) => counts.update(item, c + w)
          case None => counts.update(item, w)
        }
      }
      while (counts.size > k) shrink()
    }

    /** Top-n by estimated count, count desc then item asc (deterministic). */
    def topK(n: Int): Seq[(String, Long)] =
      counts.toSeq.sortBy { case (item, c) => (-c, item) }.take(n)

    def serialize(): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k)
      out.writeLong(total)
      out.writeInt(counts.size)
      counts.toSeq.sortBy(_._1).foreach { case (item, c) =>
        val b = item.getBytes(StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.flush()
      bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new Summary(in.readInt())
    s.total = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    s
  }
}

/** `mg_agg(item, k)`: build a capacity-k Misra-Gries summary (binary) of a
  * string column. Partials merge map-side like any Spark aggregate. */
case class MisraGriesAgg(
    child: Expression,
    k: Int = 100,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Summary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(k)

  override def update(
      buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(
      buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: MisraGries.Summary): Any = buf.serialize()
  override def serialize(buf: MisraGries.Summary): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): MisraGries.Summary =
    MisraGries.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c.head)
  override def prettyName: String = "mg_agg"
}

object MisraGriesAgg {
  def apply(c: Column, k: Int): Column =
    GraftBridge.col(MisraGriesAgg(GraftBridge.expr(c), k)
      .toAggregateExpression())
}

/** `mg_merge(summary)`: union pre-built summaries — the rollup query side. */
case class MisraGriesMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGries.Summary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // capacity adopted from the first merged summary
  override def createAggregationBuffer(): MisraGries.Summary =
    new MisraGries.Summary(Int.MaxValue)

  override def update(
      buf: MisraGries.Summary, input: InternalRow): MisraGries.Summary = {
    val v = child.eval(input)
    if (v == null) return buf
    val o = MisraGries.deserialize(v.asInstanceOf[Array[Byte]])
    if (buf.k == Int.MaxValue) { o.mergeIn(buf); o } else { buf.mergeIn(o); buf }
  }

  override def merge(
      buf: MisraGries.Summary, other: MisraGries.Summary): MisraGries.Summary =
    if (buf.k == Int.MaxValue) { other.mergeIn(buf); other }
    else { buf.mergeIn(other); buf }

  override def eval(buf: MisraGries.Summary): Any = buf.serialize()
  override def serialize(buf: MisraGries.Summary): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): MisraGries.Summary =
    MisraGries.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesMergeAgg = copy(child = c.head)
  override def prettyName: String = "mg_merge"
}

object MisraGriesMergeAgg {
  def apply(c: Column): Column =
    GraftBridge.col(MisraGriesMergeAgg(GraftBridge.expr(c))
      .toAggregateExpression())
}

/** `mg_topk(summary, n)`: the top-n (item, est_count) map of a summary. */
case class MisraGriesTopK(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(summary: Any): Any = {
    val top = MisraGries.deserialize(summary.asInstanceOf[Array[Byte]]).topK(n)
    new ArrayBasedMapData(
      new GenericArrayData(top.map(t => UTF8String.fromString(t._1)).toArray[Any]),
      new GenericArrayData(top.map(_._2).toArray[Any]))
  }

  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
  override def prettyName: String = "mg_topk"
}

object MisraGriesTopK {
  def apply(c: Column, n: Int): Column =
    GraftBridge.col(MisraGriesTopK(GraftBridge.expr(c), n))
}
