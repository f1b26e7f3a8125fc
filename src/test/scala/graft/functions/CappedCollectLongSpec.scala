package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import graft.SparkSpec

/** CappedCollectLong — bounded posting-list aggregation: groups within
  * the cap survive with their full list, groups past the cap collapse
  * to NULL, and no buffer ever holds more than cap+1 elements. */
class CappedCollectLongSpec extends SparkSpec {
  import spark.implicits._

  test("SQL surface: small groups collected, hot groups null") {
    GraftFunctions.register(spark)
    val df = ((1 to 50).map(i => ("hot", i.toLong)) ++
      Seq(("rare", 100L), ("rare", 200L), ("solo", 7L)))
      .toDF("k", "v")
    val out = df.groupBy($"k")
      .agg(GraftFunctions.collectCapped($"v", 20).as("vs"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out("hot").isEmpty)
    assert(out("rare").map(_.sorted) == Some(Seq(100L, 200L)))
    assert(out("solo") == Some(Seq(7L)))
  }

  test("group of exactly cap elements survives intact") {
    GraftFunctions.register(spark)
    val df = (1 to 20).map(i => ("k", i.toLong)).toDF("k", "v")
    val out = df.groupBy($"k")
      .agg(GraftFunctions.collectCapped($"v", 20).as("vs"))
      .collect().head.getSeq[Long](1)
    assert(out.sorted == (1L to 20L))
  }

  test("buffer never exceeds cap+1 elements during update (the memory-bomb guard)") {
    val agg = CappedCollectLong(BoundReference(0, LongType, nullable = true), cap = 5)
    val buf = agg.createAggregationBuffer()
    var maxSeen = 0
    (1L to 100000L).foreach { v =>
      agg.update(buf, InternalRow(v))
      maxSeen = math.max(maxSeen, buf.items.length)
    }
    assert(maxSeen <= 6) // cap + 1, immediately cleared on overflow
    assert(buf.over && buf.items.isEmpty)
    assert(agg.eval(buf) == null)
  }

  test("merge: overflow poisons, two partials exceeding cap jointly overflow") {
    val agg = CappedCollectLong(BoundReference(0, LongType, nullable = true), cap = 5)
    val a = agg.createAggregationBuffer()
    val b = agg.createAggregationBuffer()
    (1L to 3L).foreach(v => agg.update(a, InternalRow(v)))
    (4L to 7L).foreach(v => agg.update(b, InternalRow(v)))
    val m = agg.merge(a, b) // 3 + 4 = 7 > 5
    assert(m.over && m.items.isEmpty)

    val c = agg.createAggregationBuffer()
    val d = agg.createAggregationBuffer()
    (1L to 2L).foreach(v => agg.update(c, InternalRow(v)))
    (3L to 5L).foreach(v => agg.update(d, InternalRow(v)))
    val ok = agg.merge(c, d) // 2 + 3 = 5 ≤ 5
    assert(!ok.over && ok.items.sorted == mutable.ArrayBuffer(1L, 2L, 3L, 4L, 5L))
  }

  test("serialize/deserialize round-trips both states") {
    val agg = CappedCollectLong(BoundReference(0, LongType, nullable = true), cap = 5)
    val a = agg.createAggregationBuffer()
    (1L to 4L).foreach(v => agg.update(a, InternalRow(v)))
    val a2 = agg.deserialize(agg.serialize(a))
    assert(!a2.over && a2.items == a.items)

    (5L to 7L).foreach(v => agg.update(a, InternalRow(v)))
    val o2 = agg.deserialize(agg.serialize(a))
    assert(o2.over && o2.items.isEmpty)
  }

  test("null inputs are skipped like collect_list") {
    val agg = CappedCollectLong(BoundReference(0, LongType, nullable = true), cap = 3)
    val buf = agg.createAggregationBuffer()
    agg.update(buf, InternalRow(1L))
    agg.update(buf, InternalRow(null))
    agg.update(buf, InternalRow(2L))
    assert(buf.items == mutable.ArrayBuffer(1L, 2L))
  }
}
