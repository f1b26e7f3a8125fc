package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed semantics for the temporal join operators (SURVEY §2
  * C11/C12): AS-OF boundary cases (equal-ts match, no-prior drop/keep,
  * latest-of-several) and range-count boundary cases (inclusive lo,
  * exclusive hi, zero-count intervals, out-of-spine intervals) — plus
  * a brute-force equivalence check on random data for each.
  */
class TemporalJoinsSpec extends SparkSpec {
  import org.apache.spark.sql.{DataFrame, Row}

  private def left(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "ts", "tag")
  }
  private def right(rows: (Long, Long, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "rts", "payload")
  }

  test("asof picks the latest right row at or before each left ts") {
    val l = left((1L, 10L, "a"), (1L, 20L, "b"), (1L, 35L, "c"))
    val r = right((1L, 5L, 1.0), (1L, 18L, 2.0), (1L, 30L, 3.0))
    val out = AsofJoin.lastPrior(l, r, "k", "ts", "rts")
      .select("tag", "asof_rts", "asof_payload").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).sortBy(_._1)
    assert(out.toSeq === Seq(("a", 5L, 1.0), ("b", 18L, 2.0), ("c", 30L, 3.0)))
  }

  test("asof matches a right row at exactly the left ts (>= semantics)") {
    val l = left((1L, 10L, "a"))
    val r = right((1L, 10L, 9.0), (1L, 4L, 1.0))
    val out = AsofJoin.lastPrior(l, r, "k", "ts", "rts").collect()
    assert(out.length === 1 && out.head.getAs[Double]("asof_payload") === 9.0)
  }

  test("asof inner drops unmatched lefts; outer keeps them with nulls") {
    val l = left((1L, 3L, "early"), (2L, 50L, "other-key"))
    val r = right((1L, 5L, 1.0))
    assert(AsofJoin.lastPrior(l, r, "k", "ts", "rts").count() === 0)
    val outer = AsofJoin.lastPrior(l, r, "k", "ts", "rts", inner = false).collect()
    assert(outer.length === 2 && outer.forall(_.isNullAt(outer.head.fieldIndex("asof_payload"))))
  }

  test("asof ignores null-key and null-ts right rows (join semantics for nulls)") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(10L), "nullkey"))
      .toDF("k", "ts", "tag")
    // a null-key right row and a null-ts right row can match NOTHING
    // in a real join; the window formulation must not carry their
    // payloads forward either
    val r = Seq((None, Some(5L), 111.0), (Some(1L), None, 222.0), (Some(1L), Some(4L), 1.0))
      .toDF("k", "rts", "payload")
    val out = AsofJoin.lastPrior(l, r, "k", "ts", "rts").collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("tag") === "a")
    assert(out.head.getAs[Double]("asof_payload") === 1.0)
  }

  test("asof keys never cross-match") {
    val l = left((1L, 100L, "a"))
    val r = right((2L, 5L, 7.0))
    assert(AsofJoin.lastPrior(l, r, "k", "ts", "rts").count() === 0)
  }

  test("asof equals a brute-force window-max join on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lRows = Seq.tabulate(300)(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, s"t$i"))
    // distinct (k, ts) on the right: the operator's determinism precondition
    val rRows = Seq.tabulate(200)(i => (rnd.nextInt(10).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
    val l = lRows.toDF("k", "ts", "tag")
    val r = rRows.toDF("k", "rts", "payload")
    val got = AsofJoin.lastPrior(l, r, "k", "ts", "rts")
      .select("k", "ts", "tag", "asof_rts").as[(Long, Long, String, Long)]
      .collect().toSet
    val byKey = rRows.groupBy(_._1)
    val want = lRows.flatMap { case (k, ts, tag) =>
      byKey.getOrElse(k, Nil).filter(_._2 <= ts).sortBy(_._2).lastOption
        .map(m => (k, ts, tag, m._2))
    }.toSet
    assert(got === want)
  }

  test("range count: inclusive lo, exclusive hi, zero and out-of-spine intervals") {
    import spark.implicits._
    val points = Seq(10L, 10L, 11L, 14L, 20L).toDF("p")
    val intervals = Seq(
      ("a", 10L, 15L), // points 10,10,11,14 -> 4
      ("b", 15L, 20L), // exclusive hi: 20 not counted -> 0
      ("c", 20L, 21L), // exactly one point
      ("d", 100L, 107L), // entirely past the points -> 0
      ("e", 0L, 3L)) // entirely before the points -> 0
      .toDF("id", "lo", "hi")
    val got = RangeJoin.intervalPointCounts(points, intervals, Seq("id"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 4L, "b" -> 0L, "c" -> 1L, "d" -> 0L, "e" -> 0L))
  }

  test("range count: null bounds contain nothing; all-null inputs yield zeros") {
    import spark.implicits._
    val points = Seq(10L, 11L).toDF("p")
    val intervals = Seq(
      ("a", Some(10L), Some(12L)),
      ("b", None, Some(12L)),
      ("c", Some(10L), None),
      ("d", Option.empty[Long], Option.empty[Long]))
      .toDF("id", "lo", "hi")
    val got = RangeJoin.intervalPointCounts(points, intervals, Seq("id"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 2L, "b" -> 0L, "c" -> 0L, "d" -> 0L))
    // no points and only null intervals: every interval reports 0
    val empty = RangeJoin.intervalPointCounts(
      Seq.empty[Long].toDF("p"),
      Seq(("x", Option.empty[Long], Option.empty[Long])).toDF("id", "lo", "hi"),
      Seq("id")).as[(String, Long)].collect().toMap
    assert(empty === Map("x" -> 0L))
  }

  test("range count refuses a non-dimension-bounded value domain") {
    import spark.implicits._
    val points = Seq(0L, 1L << 40).toDF("p") // micros-scale outlier
    val intervals = Seq(("a", 0L, 10L)).toDF("id", "lo", "hi")
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.intervalPointCounts(points, intervals, Seq("id"))
    }
    assert(ex.getMessage.contains("not dimension-bounded"))
  }

  test("range count equals a brute-force containment count on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(500)(rnd.nextInt(300).toLong)
    val ivs = Seq.tabulate(80) { i =>
      val lo = rnd.nextInt(320).toLong - 10
      (s"i$i", lo, lo + rnd.nextInt(40).toLong)
    }
    val got = RangeJoin.intervalPointCounts(pts.toDF("p"), ivs.toDF("id", "lo", "hi"), Seq("id"))
      .as[(String, Long)].collect().toMap
    val want = ivs.map { case (id, lo, hi) => id -> pts.count(p => p >= lo && p < hi).toLong }.toMap
    assert(got === want)
  }

  // ---- C32 nearest-event join ----

  private def nearestOf(l: DataFrame, r: DataFrame): Map[String, (Long, Long, String)] =
    NearestJoin.nearest(l, r, "k", "ts", "rts")
      .select("tag", "near_ts", "gap", "direction").collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap

  test("nearest picks the closer side, breaks ties backward, same-instant is backward gap 0") {
    val l = left((1L, 14L, "backWins"), (1L, 16L, "fwdWins"), (1L, 15L, "tieBack"),
      (1L, 20L, "sameInstant"), (1L, 5L, "beforeAll"), (1L, 99L, "afterAll"))
    val r = right((1L, 10L, 0.0), (1L, 20L, 0.0))
    val got = nearestOf(l, r)
    assert(got("backWins") === ((10L, 4L, "back")))
    assert(got("fwdWins") === ((20L, 4L, "fwd")))
    assert(got("tieBack") === ((10L, 5L, "back")))
    assert(got("sameInstant") === ((20L, 0L, "back")))
    assert(got("beforeAll") === ((10L, 5L, "fwd")))
    assert(got("afterAll") === ((20L, 79L, "back")))
  }

  test("nearest: keys without right rows drop (inner), duplicate right timestamps dedup") {
    val l = left((1L, 10L, "a"), (2L, 10L, "noRight"))
    val r = right((1L, 12L, 1.0), (1L, 12L, 2.0)) // duplicate (k, ts)
    val got = nearestOf(l, r)
    assert(got === Map("a" -> ((12L, 2L, "fwd"))))
  }

  test("nearest equals a brute-force scan on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ls = Seq.tabulate(300)(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, s"t$i"))
    val rs = Seq.fill(120)((rnd.nextInt(6).toLong, rnd.nextInt(1000).toLong, 0.0))
    val got = nearestOf(ls.toDF("k", "ts", "tag"), rs.toDF("k", "rts", "payload"))
    val byK = rs.map(x => (x._1, x._2)).distinct.groupBy(_._1)
    val want = ls.flatMap { case (k, ts, tag) =>
      byK.get(k).map { cands =>
        val best = cands.map(_._2).minBy(c => (math.abs(c - ts), if (c <= ts) 0 else 1))
        tag -> ((best, math.abs(best - ts),
          if (best <= ts) "back" else "fwd"))
      }
    }.toMap
    assert(got === want)
  }
}
