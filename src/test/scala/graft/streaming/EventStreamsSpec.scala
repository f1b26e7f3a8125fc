package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** H4: Structured Streaming parity specs driven by MemoryStream. */
class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def ev(id: Long, minute: Int, user: Long = 1L, typ: String = "click", v: Double = 1.0) =
    StreamEvent(id, ts(minute), user, typ, v)

  test("windowedCounts emits finalized 5-min windows in append mode") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.windowedCounts(in.toDF())
      .writeStream.format("memory").queryName("win_out").outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 0), ev(2, 1), ev(3, 4), ev(4, 6))
      q.processAllAvailable()
      // watermark: max(6min) - 10min < window ends -> nothing final yet
      in.addData(ev(5, 30, typ = "view"))
      q.processAllAvailable()
      in.addData(ev(6, 60, typ = "view")) // pushes watermark to 50min
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .as[(String, String, Long, Double)].collect().toSet
      assert(rows.contains(("2024-01-01 00:00:00", "click", 3L, 3.0)))
      assert(rows.contains(("2024-01-01 00:05:00", "click", 1L, 1.0)))
      assert(rows.contains(("2024-01-01 00:30:00", "view", 1L, 1.0)))
    } finally q.stop()
  }

  test("sessionize closes a session after a 30-min gap and keeps state per user") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("sess_out").outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 5 min apart (one session); user 2: one event
      in.addData(ev(1, 0), ev(2, 5), ev(3, 2, user = 2L, v = 7.0))
      q.processAllAvailable()
      // 40-min gap for user 1 -> new session; advances watermark enough
      // to time out user 2's and user 1's first sessions
      in.addData(ev(4, 120))
      q.processAllAvailable()
      in.addData(ev(5, 300)) // flush remaining state via watermark
      q.processAllAvailable()
      val sessions = spark.table("sess_out").as[SessionOut].collect().toSet
      def us(minute: Int): Long = ts(minute).getTime * 1000L
      assert(sessions.contains(SessionOut(1L, 2L, us(0), us(5), 2.0)))
      assert(sessions.contains(SessionOut(2L, 1L, us(2), us(2), 7.0)))
      assert(sessions.contains(SessionOut(1L, 1L, us(120), us(120), 1.0)))
    } finally q.stop()
  }

  test("sessionize holds provisional sessions so a late bridging event merges them") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.sessionize(in.toDS())
      .writeStream.format("memory").queryName("bridge_out").outputMode(OutputMode.Append()).start()
    try {
      // two events 40 min apart: provisionally TWO sessions, but the
      // watermark hasn't sealed the first, so nothing may be emitted yet
      in.addData(ev(1, 0), ev(2, 40))
      q.processAllAvailable()
      assert(spark.table("bridge_out").count() === 0)
      // a late event at 20 min (inside the 30-min watermark horizon)
      // bridges them: 20-0 and 40-20 are both within the gap
      in.addData(ev(3, 20))
      q.processAllAvailable()
      in.addData(ev(9, 300)) // advance the watermark, seal everything old
      q.processAllAvailable()
      val sessions = spark.table("bridge_out").as[SessionOut].collect().toSet
      def us(minute: Int): Long = ts(minute).getTime * 1000L
      assert(sessions === Set(SessionOut(1L, 3L, us(0), us(40), 3.0)))
    } finally q.stop()
  }

  test("dedup chains into windowed aggregation as one incremental query") {
    // The streaming twin of the batch t_pipeline composition claim:
    // stage outputs are ordinary streaming DataFrames, so watermarked
    // dedup feeds the windowed agg in a single query with one shared
    // watermark — duplicates never reach the window counts.
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.windowedCounts(
        EventStreams.dedupByKey(in.toDF(), "event_id"), declareWatermark = false)
      .writeStream.format("memory").queryName("pipe_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 0), ev(2, 1), ev(1, 2, v = 99.0), ev(2, 3)) // two dups
      q.processAllAvailable()
      in.addData(ev(9, 60)) // advance watermark far past the first window
      q.processAllAvailable()
      val rows = spark.table("pipe_out").as[(String, String, Long, Double)].collect().toSet
      // 4 raw events, 2 distinct ids -> count 2, sum 2.0 (dup v=99 dropped)
      assert(rows.contains(("2024-01-01 00:00:00", "click", 2L, 2.0)))
    } finally q.stop()
  }

  test("dedupByKey drops duplicate event ids within the watermark") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.dedupByKey(in.toDF(), "event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev(1, 0, v = 1.0), ev(2, 1), ev(1, 2, v = 99.0)) // dup id 1
      q.processAllAvailable()
      in.addData(ev(2, 3), ev(3, 4)) // dup id 2 in a later batch
      q.processAllAvailable()
      val rows = spark.table("dedup_out").as[StreamEvent].collect()
      assert(rows.map(_.event_id).sorted.toSeq === Seq(1L, 2L, 3L))
      // first occurrence of id 1 survived, not the v=99 duplicate
      assert(rows.find(_.event_id == 1L).get.value === 1.0)
    } finally q.stop()
  }

  test("userTotals maintains running per-user aggregates in complete mode") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.userTotals(in.toDF())
      .writeStream.format("memory").queryName("totals_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(ev(1, 0, user = 1L, v = 2.5), ev(2, 1, user = 2L, v = 1.0))
      q.processAllAvailable()
      in.addData(ev(3, 2, user = 1L, v = 0.5))
      q.processAllAvailable()
      val rows = spark.table("totals_out")
        .as[(Long, Long, Double)].collect().toMap2
      assert(rows(1L) === ((2L, 3.0)))
      assert(rows(2L) === ((1L, 1.0)))
    } finally q.stop()
  }

  private implicit class TripleOps(rs: Array[(Long, Long, Double)]) {
    def toMap2: Map[Long, (Long, Double)] = rs.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("incrAggState maintains the full C34 state algebra across micro-batches (round 15)") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.incrAggState(in.toDF())
      .writeStream.format("memory").queryName("incr_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      // batch 1 sets min and max; batch 2 must EXTEND the min and the
      // sum/count while leaving the max alone — the inserts-only
      // min/max maintenance the batch C34 key cannot claim under
      // deletes
      in.addData(ev(1, 0, typ = "click", v = 2.5), ev(2, 1, typ = "click", v = 7.0),
        ev(3, 2, typ = "view", v = 4.0))
      q.processAllAvailable()
      in.addData(ev(4, 3, typ = "click", v = 0.5))
      q.processAllAvailable()
      val rows = spark.table("incr_out")
        .collect().map(r => (r.getString(0), (r.getDouble(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
      assert(rows("click") === ((10.0, 3L, 0.5, 7.0, 10.0 / 3.0)))
      assert(rows("view") === ((4.0, 1L, 4.0, 4.0, 4.0)))
      // merge ≡ recompute: the final state equals the batch aggregate
      // over every event seen (the IVM law, in-test twin)
      val batch = EventStreams.incrAggState(
        Seq(ev(1, 0, typ = "click", v = 2.5), ev(2, 1, typ = "click", v = 7.0),
          ev(3, 2, typ = "view", v = 4.0), ev(4, 3, typ = "click", v = 0.5)).toDF())
      assert(spark.table("incr_out").except(batch).count() === 0
        && batch.except(spark.table("incr_out")).count() === 0)
    } finally q.stop()
  }

  test("windowedHeavyHitters merges the sketch across micro-batches per window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.windowedHeavyHitters(in.toDF(), capacity = 16)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [00:00, 00:05): user 7 × 3 and user 8 × 1 in batch one...
      in.addData(ev(1, 0, user = 7L), ev(2, 1, user = 7L), ev(3, 2, user = 8L),
        ev(4, 3, user = 7L))
      q.processAllAvailable()
      // ...then user 8 × 2 more in a second batch of the SAME window —
      // the final summary must reflect both batches' counts.
      in.addData(ev(5, 4, user = 8L), ev(6, 4, user = 8L))
      q.processAllAvailable()
      in.addData(ev(9, 60, user = 1L)) // advance the watermark, close the window
      q.processAllAvailable()
      val rows = spark.table("hh_out")
        .filter($"window_start" === "2024-01-01 00:00:00")
        .select("rank", "user_id", "est_count", "max_err")
        .as[(Long, Long, Long, Long)].collect().toSet
      // capacity 16 > 2 distinct users -> exact counts, zero error
      assert(rows === Set((1L, 7L, 3L, 0L), (2L, 8L, 3L, 0L)))
    } finally q.stop()
  }

  test("windowedDistinctUsers merges HLL state across batches; duplicates don't inflate") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.windowedDistinctUsers(in.toDF())
      .writeStream.format("memory").queryName("du_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // window [00:00, 00:05): users {7, 8} in batch one...
      in.addData(ev(1, 0, user = 7L), ev(2, 1, user = 8L), ev(3, 2, user = 7L))
      q.processAllAvailable()
      // ...user 9 plus REPLAYED user-7/8 rows in batch two: the
      // idempotent register merge must land on ~3 distinct, not ~5
      in.addData(ev(4, 3, user = 9L), ev(5, 3, user = 7L), ev(6, 4, user = 8L))
      q.processAllAvailable()
      in.addData(ev(9, 60, user = 1L)) // advance the watermark, close the window
      q.processAllAvailable()
      val est = spark.table("du_out")
        .filter($"window_start" === "2024-01-01 00:00:00")
        .select("est_users").as[Double].collect()
      assert(est.length === 1)
      // n=3 with m=256 sits in the linear-counting regime: tight
      assert(math.abs(est(0) - 3.0) < 0.2, s"estimate ${est(0)}")
    } finally q.stop()
  }

  test("clickAttribution joins purchases to preceding clicks within the window") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.clickAttribution(in.toDF(), windowMinutes = 10)
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        ev(1, 0, user = 1L),                                 // click @0
        ev(2, 5, user = 1L, typ = "purchase", v = 9.0),      // within 10 min -> match
        ev(3, 40, user = 1L, typ = "purchase", v = 2.0),     // 40 min after click -> no match
        ev(4, 3, user = 2L, typ = "purchase", v = 5.0))      // user 2 never clicked
      q.processAllAvailable()
      in.addData(ev(9, 200, user = 9L)) // advance watermarks to flush
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .select("user_id", "click_id", "purchase_id", "value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === Set((1L, 1L, 2L, 9.0)))
    } finally q.stop()
  }

  test("dailyEwma seals days in order and reproduces the batch smoothing exactly") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    def dayEv(id: Long, day: Int, minute: Int, typ: String = "click") =
      StreamEvent(id, Timestamp.valueOf(f"2024-01-${day + 1}%02d ${minute / 60}%02d:${minute % 60}%02d:00"),
        1L, typ, 1.0)
    val in = MemoryStream[StreamEvent]
    val q = EventStreams.dailyEwma(in.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // day 1: 3 clicks; day 2: 1 click — split across batches, with a
      // LATE day-1 event arriving in batch two (inside the horizon)
      in.addData(dayEv(1, 0, 10), dayEv(2, 0, 20))
      q.processAllAvailable()
      in.addData(dayEv(3, 0, 30), dayEv(4, 1, 10))
      q.processAllAvailable()
      // day 3 click; pushes the watermark past day 1 and day 2 ends
      in.addData(dayEv(5, 2, 120))
      q.processAllAvailable()
      // far-future other-type event seals day 3 too
      in.addData(dayEv(9, 20, 0, typ = "flush"))
      q.processAllAvailable()
      val got = spark.table("ewma_out").as[EwmaOut].collect()
        .filter(_.event_type == "click").sortBy(_.day)
      // hand-computed batch chain: d1 ewma = 3; d2 = (1 + 3*0.5)/1.5;
      // d3 = (1 + 1*0.5 + 3*0.25)/1.75
      assert(got.map(o => (o.day, o.n)).toSeq ===
        Seq(("2024-01-01", 3L), ("2024-01-02", 1L), ("2024-01-03", 1L)))
      assert(got(0).ewma === 3.0)
      assert(got(1).ewma === (1.0 + 3.0 * 0.5) / 1.5)
      assert(got(2).ewma === (1.0 + 1.0 * 0.5 + 3.0 * 0.25) / 1.75)
    } finally q.stop()
  }

  test("StreamReplay: sealed output is invariant to micro-batch slicing") {
    // The hard-signal replay promises the streaming result EQUALS the
    // batch twin's, which implies the emitted set cannot depend on how
    // the stream was chunked: one giant batch and many small batches
    // (different watermark advancement schedules, different state
    // merge interleavings) must seal identical sessions.
    val one = StreamReplay.replay(spark, sfDir, chunks = 1)(
      ds => EventStreams.sessionize(ds).toDF()) {
      out => out.filter(out("user_id") =!= StreamReplay.SENTINEL_USER)
    }
    val many = StreamReplay.replay(spark, sfDir, chunks = 13)(
      ds => EventStreams.sessionize(ds).toDF()) {
      out => out.filter(out("user_id") =!= StreamReplay.SENTINEL_USER)
    }
    assert(one.count() === many.count())
    assert(one.except(many).count() === 0 && many.except(one).count() === 0)
  }

  test("streaming dedup and chained pipeline: sealed output invariant to micro-batch slicing") {
    // e_stream_dedup's exactness argument says the sealed key set
    // cannot depend on chunking (duplicate span < watermark delay
    // under the sorted replay); the chained dedup→window pipeline
    // inherits it plus append-mode sealing. One giant batch vs many
    // small batches must agree exactly for both.
    def run(chunks: Int, pipe: org.apache.spark.sql.Dataset[StreamEvent] => org.apache.spark.sql.DataFrame) =
      StreamReplay.replay(spark, sfDir, chunks = chunks)(pipe) {
        out => out.filter(out("event_type") =!= StreamReplay.SENTINEL_TYPE)
      }
    for (pipe <- Seq(
        (ds: org.apache.spark.sql.Dataset[StreamEvent]) => EventStreams.dedupActivityKeys(ds.toDF()),
        (ds: org.apache.spark.sql.Dataset[StreamEvent]) => EventStreams.dedupThenWindowCounts(ds.toDF()))) {
      val one = run(1, pipe)
      val many = run(13, pipe)
      assert(one.count() === many.count())
      assert(one.except(many).count() === 0 && many.except(one).count() === 0)
    }
  }

  test("stream-static enrichment: sealed output invariant to slicing and equal to the batch join") {
    // H22's stream-static join keeps no state, so neither the chunking
    // nor the per-batch re-plan of the static side may change the
    // sealed (window, segment) aggregate — and it must equal the plain
    // batch join+group computed outside the streaming engine.
    import org.apache.spark.sql.functions._
    val dim = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    def run(chunks: Int) = StreamReplay.replay(spark, sfDir, chunks = chunks)(
      ds => EventStreams.enrichStaticWindowed(ds.toDF(), dim))(identity)
    val one = run(1)
    val many = run(13)
    assert(one.count() === many.count())
    assert(one.except(many).count() === 0 && many.except(one).count() === 0)
    val batch = graft.Tables.events(spark, sfDir)
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), s"${EventStreams.WINDOW_SEC} seconds"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("c_mktsegment").as("mktsegment"), col("n_events"), col("sum_value"))
    assert(many.except(batch).count() === 0 && batch.except(many).count() === 0)
  }

  test("streaming CDC state: slicing-invariant, equals batch, tombstoned keys revive") {
    import org.apache.spark.sql.functions._
    def run(chunks: Int) = StreamReplay.replay(spark, sfDir, chunks = chunks,
      mode = org.apache.spark.sql.streaming.OutputMode.Complete())(
      ds => EventStreams.cdcState(ds.toDF())) {
      out => out.filter(out("user_id") =!= StreamReplay.SENTINEL_USER &&
        out("last_type") =!= "error")
    }
    val one = run(1)
    val many = run(13)
    assert(one.count() === many.count())
    assert(one.except(many).count() === 0 && many.except(one).count() === 0)
    // batch equality (the q_cdc operator computed outside streaming)
    val batch = graft.SparkEntry.queries("q_cdc")(spark, sfDir)
    assert(many.except(batch).count() === 0 && batch.except(many).count() === 0)
    // revival semantics: surviving keys WITH mid-history deletes exist
    // (a tombstone must not permanently kill a key's state)
    assert(many.filter(col("n_deletes") >= 1).count() > 0,
      "expected at least one revived key with mid-history tombstones")
  }

  test("stream-stream LEFT OUTER join: slicing-invariant, both arms non-degenerate") {
    // H26: unmatched-left emission is watermark-gated, so the
    // slicing changes WHEN null rows emit — never WHETHER; and the
    // readout only proves the semantics if both arms actually occur
    import org.apache.spark.sql.functions._
    def run(chunks: Int) = StreamReplay.replay(spark, sfDir, chunks = chunks)(
      ds => EventStreams.clickAttributionOuter(ds.toDF())) {
      out => out.filter(out("user_id") =!= StreamReplay.SENTINEL_USER)
    }
    val one = run(1)
    val many = run(13)
    assert(one.count() === many.count())
    assert(one.except(many).count() === 0 && many.except(one).count() === 0)
    assert(many.filter(col("purchase_id").isNull).count() > 0,
      "no unconverted clicks — the outer arm is degenerate on this corpus")
    assert(many.filter(col("purchase_id").isNotNull).count() > 0,
      "no converted clicks — the matched arm is degenerate on this corpus")
    // matched rows equal the INNER join's (outer adds, never alters)
    val inner = StreamReplay.replay(spark, sfDir)(
      ds => EventStreams.clickAttribution(ds.toDF())) {
      out => out.filter(out("user_id") =!= StreamReplay.SENTINEL_USER)
    }
    val matched = many.filter(col("purchase_id").isNotNull)
      .select("user_id", "click_id", "purchase_id", "value", "click_ts", "purchase_ts")
    assert(matched.except(inner).count() === 0 && inner.except(matched).count() === 0)
  }

  test("replay leaves the caller session untouched: no conf latch, no sink views") {
    // round-11 review: the replay's conf toggles and memory-sink view
    // live on an ISOLATED session — a concurrent query on the shared
    // session must never observe replay settings (a latched
    // noDataMicroBatches=false would silently stop its sealed-window
    // emission), and sink views must not accumulate for the session's
    // life. This also cured the full-suite bench context anomaly.
    val noData = "spark.sql.streaming.noDataMicroBatches.enabled"
    val priorNoData = spark.conf.get(noData, "true")
    val priorShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val viewsBefore = spark.catalog.listTables().count()
    val out = StreamReplay.replay(spark, sfDir)(
      ds => EventStreams.windowedCounts(ds.toDF())) {
      o => o.filter(o("event_type") =!= StreamReplay.SENTINEL_TYPE)
    }
    assert(out.count() > 0)
    assert(spark.conf.get(noData, "true") === priorNoData,
      "replay latched noDataMicroBatches on the caller session")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === priorShuffle,
      "replay latched shuffle partitions on the caller session")
    assert(spark.catalog.listTables().count() === viewsBefore,
      "replay leaked a memory-sink view into the caller catalog")
  }

  test("StreamReplay.feed never draws more than one chunk ahead of delivery") {
    // The replay's driver-memory contract: the feed pulls from the
    // (executor-backed) iterator lazily, so between deliveries at most
    // `per` events have been drawn beyond what was already delivered —
    // the full table is never held driver-side. A refactor that
    // re-introduced a collect (or an eager grouping) fails here.
    val total = 1000
    val per = 64
    var pulled = 0
    var delivered = 0
    val src = Iterator.tabulate(total) { i =>
      pulled += 1
      StreamEvent(i.toLong, new java.sql.Timestamp(i.toLong), 1L, "click", 0.0)
    }
    StreamReplay.feed(src, per) { chunk =>
      assert(pulled <= delivered + per,
        s"feed drew $pulled events with only $delivered delivered (chunk=$per): not lazy")
      delivered += chunk.size
    }
    assert(delivered === total)
  }
}
