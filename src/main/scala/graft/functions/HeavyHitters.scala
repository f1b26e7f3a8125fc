package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable Misra-Gries heavy-hitters summary over a long-typed item
  * stream: at most `capacity` counters of constant size, mergeable
  * across partitions, with the classic frequency guarantee — for every
  * item, `est ≤ true_count ≤ est + max_err`, and any item whose true
  * count exceeds n/capacity is guaranteed to be present in the
  * summary.
  *
  * This is the sketch companion to the HLL/quantile aggregations
  * (SURVEY §2 C10): at 100 TB an exact "top sellers" groupBy shuffles
  * one row per distinct key; the sketch shuffles `capacity` counters
  * per partition regardless of the key cardinality, and the merge is
  * associative so Spark's partial aggregation applies untouched.
  *
  * Decrement-all is O(1) via the offset trick (effective count =
  * stored − offset; overflow bumps the offset and purges ≤ 0
  * counters, amortized over insertions). Merge sums stored counts and
  * offsets, then re-trims to `capacity` by raising the offset to the
  * (capacity+1)-th largest effective count (Agarwal et al.'s
  * mergeable-summaries construction — the error bounds add).
  *
  * Output: array<struct<item, est, max_err>> sorted (est DESC,
  * item ASC), est the guaranteed lower bound and max_err the
  * summary's offset (so est + max_err upper-bounds the true count).
  */
case class HeavyHitters(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.State] {

  require(capacity > 0, s"heavy-hitters needs capacity > 0, got $capacity")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))))
  override def prettyName: String = "graft_heavy_hitters"

  override def createAggregationBuffer(): HeavyHitters.State =
    new HeavyHitters.State(0L, mutable.LongMap.empty[Long])

  override def update(st: HeavyHitters.State, input: InternalRow): HeavyHitters.State = {
    val v = item.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      // NOTE: counts is a primitive-valued LongMap — getOrNull would
      // unbox a missing key to 0L, so membership must go through the
      // Option API.
      st.counts.get(x) match {
        case Some(stored) => st.counts.update(x, stored + 1L)
        case None if st.counts.size < capacity =>
          st.counts.update(x, st.offset + 1L)
        case None =>
          // decrement-all: raise the offset, purge dead counters, and
          // only then admit the new item if a slot opened.
          st.offset += 1L
          st.counts.filterInPlace((_, c) => c > st.offset)
          if (st.counts.size < capacity) st.counts.update(x, st.offset + 1L)
      }
    }
    st
  }

  override def merge(a: HeavyHitters.State, b: HeavyHitters.State): HeavyHitters.State = {
    // Merge in EFFECTIVE (offset-free) counts, then re-base on the
    // summed offset: stored = (offA + offB) + effA + effB holds for
    // items in either side (a missing side contributes eff 0), which
    // keeps est ≤ true ≤ est + offset with the error bounds adding.
    val offA = a.offset
    val offB = b.offset
    a.counts.transformValues(_ + offB) // rebase a's items to offA+offB
    b.counts.foreach { case (x, cb) =>
      val effB = cb - offB
      a.counts.get(x) match {
        case Some(stored) => a.counts.update(x, stored + effB)
        case None => a.counts.update(x, offA + cb)
      }
    }
    a.offset = offA + offB
    if (a.counts.size > capacity) {
      // trim to capacity: raise the offset to the (capacity+1)-th
      // largest effective count and purge what falls at or below it
      val eff = a.counts.values.map(_ - a.offset).toArray
      java.util.Arrays.sort(eff)
      val cut = eff(eff.length - capacity - 1)
      a.offset += cut
      a.counts.filterInPlace((_, c) => c > a.offset)
    }
    a
  }

  override def eval(st: HeavyHitters.State): Any = {
    val rows = st.counts.toArray
      .map { case (x, c) => (x, c - st.offset) }
      .sortWith((p, q) => p._2 > q._2 || (p._2 == q._2 && p._1 < q._1))
    new GenericArrayData(rows.map { case (x, est) =>
      new GenericInternalRow(Array[Any](x, est, st.offset))
    })
  }

  override def serialize(st: HeavyHitters.State): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(st.offset)
    out.writeInt(st.counts.size)
    st.counts.foreach { case (x, c) => out.writeLong(x); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHitters.State = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new HeavyHitters.State(in.readLong(), mutable.LongMap.empty[Long])
    val n = in.readInt()
    var i = 0
    while (i < n) { st.counts.update(in.readLong(), in.readLong()); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object HeavyHitters {
  /** offset = total decremented mass (the summary's error bound);
    * counts store offset-relative values (effective = stored − offset). */
  final class State(var offset: Long, val counts: mutable.LongMap[Long])
}
