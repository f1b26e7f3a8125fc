package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded collect_list for BIGINT values: gathers a group's values
  * only while the group stays within `cap` elements; the moment a
  * partial buffer (or a merge of partials) exceeds the cap, the group
  * collapses to an OVERFLOW marker and the aggregate returns NULL.
  *
  * This is the scale-correct shape for "collect small groups, discard
  * big ones" — e.g. a dedup posting list kept only for rare blocking
  * keys. `collect_list` + `size(..) <= cap` buffers a hot key's FULL
  * list in one aggregation buffer before the filter throws it away:
  * at corpus scale a stop-shingle's posting list is an unbounded
  * single-key memory bomb. Here every buffer — map-side partial and
  * final merge alike — holds at most cap+1 longs by construction, so
  * the hottest key in a 100 TB corpus costs the same bounded state as
  * a rare one, and overflowed groups ship ONE marker byte through the
  * shuffle instead of their list.
  *
  * NULL inputs are skipped (collect_list semantics); the result for a
  * surviving group is insertion-ordered like collect_list (callers
  * needing determinism sort, as all graft callers do).
  */
case class CappedCollectLong(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CappedCollectLong.Buf] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint column, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_collect_capped"

  override def createAggregationBuffer(): CappedCollectLong.Buf =
    new CappedCollectLong.Buf(false, mutable.ArrayBuffer.empty[Long])

  override def update(buf: CappedCollectLong.Buf, input: InternalRow): CappedCollectLong.Buf = {
    if (!buf.over) {
      val v = child.eval(input)
      if (v != null) {
        buf.items += v.asInstanceOf[Long]
        if (buf.items.length > cap) { buf.over = true; buf.items.clear() }
      }
    }
    buf
  }

  override def merge(a: CappedCollectLong.Buf, b: CappedCollectLong.Buf): CappedCollectLong.Buf = {
    if (a.over || b.over) { a.over = true; a.items.clear() }
    else {
      a.items ++= b.items
      if (a.items.length > cap) { a.over = true; a.items.clear() }
    }
    a
  }

  override def eval(buf: CappedCollectLong.Buf): Any =
    if (buf.over) null else new GenericArrayData(buf.items.toArray)

  override def serialize(buf: CappedCollectLong.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.over)
    out.writeInt(buf.items.length)
    buf.items.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CappedCollectLong.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    buf.over = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.items += in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CappedCollectLong =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CappedCollectLong =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object CappedCollectLong {
  /** Mutable aggregation state: overflow flag + collected values.
    * Invariant: over == true ⇒ items is empty. */
  final class Buf(var over: Boolean, val items: mutable.ArrayBuffer[Long])
}
