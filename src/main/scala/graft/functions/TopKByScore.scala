package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream, ByteArrayInputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score DESC, id ASC)
  * pairs seen, returns them best-first as array<struct<score,id>>.
  *
  * This is the scale-correct shape for "top-k per group" — a
  * ROW_NUMBER window over the pair stream shuffles and sorts EVERY
  * candidate row per group before discarding all but k, while a
  * TypedImperativeAggregate gets map-side partial aggregation for
  * free: each input partition reduces to at most k entries per group
  * before the exchange, so the shuffle carries O(groups × k) rows no
  * matter how large the candidate set is. At a 100 TB corpus that is
  * the difference between shuffling the corpus and shuffling the
  * result.
  *
  * The (score DESC, id ASC) total order matches the engine's top-k
  * determinism contract (identical to the oracle's ROW_NUMBER ORDER
  * BY). Buffer is a worst-first bounded heap; spill serialization is
  * a plain (n, score, id)* byte frame.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double score, bigint id), got " +
        s"(${score.dataType.catalogString}, ${id.dataType.catalogString})")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))))
  override def prettyName: String = "graft_top_k"

  /** true iff a is WORSE than b under (score DESC, id ASC).
    * java.lang.Double.compare gives a TOTAL order (NaN greater than
    * everything — the same placement DuckDB's ORDER BY DESC gives
    * NaN, so oracle parity holds even on degenerate scores; raw
    * `<`/`==` on a NaN would stall heap eviction and break the sort
    * comparator's contract). */
  private def worse(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c < 0 || (c == 0 && a._2 > b._2)
  }

  /** Worst element at the head, so the bound check is O(1). */
  private val worstFirst: Ordering[(Double, Long)] =
    (a: (Double, Long), b: (Double, Long)) =>
      if (worse(a, b)) 1 else if (worse(b, a)) -1 else 0

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val e = (s.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(e)
      else if (worse(buf.head, e)) { buf.dequeue(); buf.enqueue(e) }
    }
    buf
  }

  override def merge(
      a: mutable.PriorityQueue[(Double, Long)],
      b: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b.foreach { e =>
      if (a.size < k) a.enqueue(e)
      else if (worse(a.head, e)) { a.dequeue(); a.enqueue(e) }
    }
    a
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val best = buf.toArray.sortWith((x, y) => worse(y, x)) // best first
    new GenericArrayData(best.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      buf.enqueue((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}
