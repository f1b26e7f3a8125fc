package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A raw stream event (mirrors the `events` table columns the
  * streaming surface needs). */
final case class StreamEvent(event_id: Long, ts: Timestamp, user_id: Long,
                             event_type: String, value: Double)

/** One closed session emitted by the stateful sessionizer. */
final case class SessionOut(user_id: Long, n_events: Long,
                            start_us: Long, end_us: Long, sum_value: Double)

/** One open session held in state: exact integer cents for the value
  * sum (the money-determinism contract — a raw double accumulator
  * would make the emitted sum depend on arrival order). */
final case class OpenSession(startUs: Long, endUs: Long, n: Long, sumCents: Long)

/** Per-user sessionizer state: every session the watermark has not
  * yet sealed, sorted by start. */
final case class SessionsState(open: List[OpenSession])

/** One sealed day emitted by the streaming EWMA. */
final case class EwmaOut(event_type: String, day: String, n: Long, ewma: Double)

/** Per-type EWMA state: unsealed per-day counters (watermark-bounded)
  * plus the trailing ≤7 sealed counts, newest first. */
final case class EwmaState(open: List[(Long, Long)], hist: List[Long])

/** Structured Streaming surface (SURVEY §2 H4): the streaming
  * counterparts of the batch events pack, spec-verified with
  * MemoryStream sources (no oracle — the driver's DuckDB gate has no
  * streaming notion).
  *
  * - [[windowedCounts]]: watermarked tumbling-window aggregation —
  *   the H1 batch query as an incremental plan. Append mode emits a
  *   window only once its watermark passes: exactly-once per window.
  * - [[sessionize]]: 30-min-gap sessions via
  *   flatMapGroupsWithState + event-time timeout — the H2 batch
  *   query as per-key incremental state. State is one small struct
  *   per active user; the watermark bounds it, so state size tracks
  *   ACTIVE users, not history — the property that matters at
  *   100 TB/day of events.
  */
object EventStreams {

  /** Shared batch/stream constants — the batch pack (EventsPack)
    * references THESE so the twins cannot silently drift. */
  val SESSION_GAP_US: Long = 1800L * 1000000L
  val WINDOW_SEC: Long = 300L

  /** Exact epoch microseconds of an event timestamp. Timestamp.getTime
    * is MILLISECOND-truncated — `getTime * 1000` silently dropped the
    * sub-ms digits the batch twins read via unix_micros, a drift the
    * cross-engine replay gate caught on real (µs-grained) data; the
    * nanos field carries the full fraction. */
  private def micros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Tumbling 5-minute windowed counts/sums with a 10-minute
    * watermark (append-mode-safe).
    *
    * @param declareWatermark false when composing BELOW a stage that
    *        already declared the event-time watermark (Spark forbids
    *        redefining it mid-query; the chain shares the upstream
    *        one — see the chained dedup→window spec). */
  def windowedCounts(events: DataFrame, declareWatermark: Boolean = true): DataFrame =
    (if (declareWatermark) events.withWatermark("ts", "10 minutes") else events)
      .groupBy(window(col("ts"), s"$WINDOW_SEC seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Per-user 30-min-gap sessionization with EVENT-TIME-correct
    * emission: a session is emitted only once the watermark passes
    * `end + gap` — before that, a late event inside the horizon can
    * still extend it or BRIDGE two provisional sessions into one, so
    * state holds the full list of unsealed sessions per user (bounded:
    * only sessions inside the watermark horizon can stay open).
    * Emitting at the first in-batch gap — the obvious shortcut —
    * would split what event-time semantics (and the batch twin
    * e_sessions) call one session, and append mode could never
    * repair it.
    *
    * Value sums accumulate as exact integer cents (HALF_UP per event,
    * matching the batch DECIMAL(18,2) cast) so the emitted double is
    * identical to e_sessions' whatever the arrival order. */
  def sessionize(events: Dataset[StreamEvent]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionsState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[StreamEvent], state: GroupState[SessionsState]) =>
          val prior = state.getOption.map(_.open).getOrElse(Nil)
          val incoming = batch.map { e =>
            val cents = java.math.BigDecimal.valueOf(e.value)
              .setScale(2, java.math.RoundingMode.HALF_UP)
              .movePointRight(2).longValueExact()
            OpenSession(micros(e.ts), micros(e.ts), 1L, cents)
          }.toList
          // Coalesce pass: prior sessions and singleton events sorted
          // by start; anything within the gap of its predecessor
          // merges (a late bridging event pulls its two neighbors
          // together here).
          val merged = (prior ++ incoming).sortBy(s => (s.startUs, s.endUs))
            .foldLeft(List.empty[OpenSession]) {
              case (cur :: done, nxt) if nxt.startUs - cur.endUs <= SESSION_GAP_US =>
                OpenSession(cur.startUs, math.max(cur.endUs, nxt.endUs),
                  cur.n + nxt.n, cur.sumCents + nxt.sumCents) :: done
              case (acc, nxt) => nxt :: acc
            }.reverse
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(_.endUs + SESSION_GAP_US <= wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionsState(open))
            state.setTimeoutTimestamp(open.map(_.endUs + SESSION_GAP_US).min / 1000L)
          }
          closed.iterator.map { s =>
            SessionOut(userId, s.n, s.startUs, s.endUs,
              new java.math.BigDecimal(java.math.BigInteger.valueOf(s.sumCents), 2)
                .doubleValue())
          }
      }
  }

  /** Streaming exact dedup on a key column (the D1 operator as an
    * incremental plan): first occurrence wins, duplicates within the
    * watermark horizon are dropped. `dropDuplicatesWithinWatermark`
    * keys state by the dedup column only and expires it with the
    * watermark, so state tracks the RECENT key set, not all history —
    * the bound that keeps a 100 TB/day ingest feasible. */
  def dedupByKey(events: DataFrame, keyCol: String,
                 watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Streaming dedup on the (user, type, 5-min window) activity key —
    * the presence-grid dedup feeding DAU/funnel pipelines, and the
    * form of streaming dedup that carries an EXACT batch oracle:
    * duplicates of one key are at most WINDOW_SEC apart in event
    * time, the watermark delay (10 min) exceeds that span, and the
    * replay feeds event-time-sorted contiguous chunks — so a key's
    * state can never expire while a duplicate is still in flight, and
    * the emitted key set EQUALS the batch `SELECT DISTINCT` whatever
    * the chunking. Only the key columns are projected, so the result
    * is also independent of WHICH physical duplicate won the race.
    * State is watermark-bounded: the keys of the active horizon, not
    * history — the bound that keeps a 100 TB/day ingest feasible. */
  def dedupActivityKeys(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("window_start",
        date_format(timestamp_seconds(expr(s"unix_micros(ts) div ${WINDOW_SEC * 1000000L} * $WINDOW_SEC")),
          "yyyy-MM-dd HH:mm:ss"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "window_start")
      .select(col("window_start"), col("event_type"), col("user_id"))

  /** CHAINED stateful pipeline — dedup THEN windowed aggregation in
    * ONE streaming query under ONE watermark: the composition case
    * multi-stage production pipelines actually exercise (two state
    * stores, the second consuming the first's in-batch output).
    * Dedup on the (user, type, window) activity key makes the
    * downstream count-per-(window, type) a streaming COUNT(DISTINCT
    * user_id) — and because the dedup is exact under the sorted
    * replay (see [[dedupActivityKeys]]) and the window agg seals on
    * the shared watermark, the sealed result EQUALS the batch
    * distinct-count twin exactly. */
  def dedupThenWindowCounts(events: DataFrame): DataFrame = {
    events
      .withWatermark("ts", "10 minutes")
      .withColumn("window_start",
        date_format(timestamp_seconds(expr(s"unix_micros(ts) div ${WINDOW_SEC * 1000000L} * $WINDOW_SEC")),
          "yyyy-MM-dd HH:mm:ss"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "window_start")
      .groupBy(window(col("ts"), s"$WINDOW_SEC seconds"), col("event_type"))
      .agg(count(lit(1)).as("n_users"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_users"))
  }

  /** Streaming per-user running totals (the H3 top-k feeder as an
    * incremental plan): complete-mode aggregation over user totals.
    * The top-k cut itself stays in the sink query (rank-over-totals
    * on a 〈users〉-sized table, not the event stream). */
  /** Stream-static enrichment (H22): the streamed events joined
    * against a STATIC dimension table inside the streaming query —
    * Spark's stream-static join needs no state at all (the static
    * side is just re-planned per micro-batch, broadcast when small),
    * which is exactly why it's the idiomatic enrichment shape vs. a
    * stateful stream-stream join. Watermark is declared BEFORE the
    * join so window sealing is untouched by enrichment; the inner
    * join drops the sentinel row (no matching dimension key), but the
    * sentinel still advances the watermark — it is tracked at the
    * source, not post-join. Aggregates per (window, segment) with the
    * batch twin's exact decimal arithmetic. */
  def enrichStaticWindowed(events: DataFrame, dim: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .join(dim, col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), s"$WINDOW_SEC seconds"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("c_mktsegment").as("mktsegment"), col("n_events"), col("sum_value"))

  /** Streaming CDC materialization (H24): C28's last-op-wins with
    * delete tombstones as an INCREMENTAL complete-mode aggregate —
    * the continuously-maintained current-state table a CDC consumer
    * keeps. State per key is one (ts, id, type, cents) struct plus
    * two counters (constant, however long the history); the struct
    * max is associative/commutative, so the incremental merges the
    * engine applies between micro-batches provably reach the batch
    * answer regardless of chunking. Tombstone filtering happens on
    * the OUTPUT (a deleted key's state must survive internally — a
    * later upsert revives it). */
  def cdcState(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        col("event_type"), (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts_us"), col("event_id"), col("event_type"), col("cents"))).as("last"),
        count(lit(1)).as("n_ops"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_deletes"))
      .select(col("user_id"), col("last.event_type").as("last_type"),
        (col("last.cents").cast("double") / 100.0).as("last_value"),
        col("n_ops"), col("n_deletes"))

  /** Streaming INCREMENTAL AGGREGATE MAINTENANCE (round 15 — C34's
    * state algebra on the replay harness): per (event_type, day), the
    * full sum/count/min/max state that Spark's incremental engine
    * merges across micro-batches is EXACTLY q_incr_agg's
    * partial-aggregate algebra lifted from the storage layer to the
    * state store — and min/max are legal here BY CONSTRUCTION: a
    * stream is inserts-only, the one regime where they are
    * maintainable without per-group rescans (the standard IVM caveat
    * C34 states). The decimal sum is order-free, so merge ≡ recompute
    * holds whatever the micro-batch boundaries; complete mode's sink
    * holds the (type × day) dimension table, never the event
    * stream. */
  def incrAggState(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .select(col("event_type"), col("day"),
        round(col("s"), 2).cast("double").as("sum_value"),
        col("n").as("n_events"),
        col("mn").cast("double").as("min_value"),
        col("mx").cast("double").as("max_value"),
        (round(col("s"), 2).cast("double") / col("n")).as("avg_value"))

  def userTotals(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("total_value"))

  /** Streaming heavy hitters: per tumbling window, the mergeable
    * Misra-Gries summary ([[graft.functions.HeavyHitters]]) of the
    * user-id stream — the sketch-over-stream shape: streaming state
    * stores the serialized constant-size summary per window (not the
    * per-key counts an exact top-k would keep), and the aggregate's
    * associative merge is exactly what the incremental engine applies
    * between micro-batches. Append mode emits a window's summary once
    * the watermark closes it. */
  def windowedHeavyHitters(events: DataFrame, capacity: Int): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), s"$WINDOW_SEC seconds"))
      .agg(graft.functions.GraftFunctions.heavyHitters(col("user_id"), capacity).as("hh"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        posexplode(col("hh")).as(Seq("pos", "h")))
      .select(col("window_start"), (col("pos") + 1).cast("long").as("rank"),
        col("h.item").as("user_id"), col("h.est").as("est_count"),
        col("h.max_err").as("max_err"))
  }

  /** Streaming distinct users per tumbling window via the HLL
    * register column ([[graft.functions.Hll]]) — the other
    * sketch-over-stream shape next to [[windowedHeavyHitters]]:
    * per-window streaming state is ONE 256-byte register array
    * however many users the window sees (exact distinct state grows
    * with the user set), and the register-max merge the incremental
    * engine applies between micro-batches is idempotent, so
    * replayed/duplicated input rows cannot inflate the estimate —
    * the property that makes the sketch safe under at-least-once
    * upstream delivery. */
  def windowedDistinctUsers(events: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(events.sparkSession)
    import graft.functions.GraftFunctions.{hllCard, hllMerge, hllUnit}
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), s"$WINDOW_SEC seconds"))
      .agg(hllMerge(hllUnit(xxhash64(col("user_id")))).as("regs"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        round(hllCard(col("regs")), 3).as("est_users"))
  }

  /** Stream-stream inner join: attribute each `purchase` to the
    * `click`s by the same user in the preceding `windowMinutes`.
    * Both sides carry watermarks and the join has a two-sided event-
    * time constraint, so Spark can BOUND the join state: a click is
    * dropped from state once the purchase-side watermark passes
    * click_ts + window — state size tracks the active window, not
    * the stream's history (the property that matters at 100 TB/day). */
  def clickAttribution(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", s"$windowMinutes minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", s"$windowMinutes minutes")
    clicks.join(purchases,
      expr(s"""user_id = p_user
              | AND purchase_ts >= click_ts
              | AND purchase_ts <= click_ts + interval $windowMinutes minutes""".stripMargin))
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("value"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Stream-stream LEFT OUTER interval join (SURVEY §2 H26) — the
    * "unconverted clicks" readout: every click with its in-window
    * purchase, or NULLs once the watermark PROVES no purchase can
    * still arrive. This is the semantics [[clickAttribution]]'s inner
    * join cannot express: an unmatched left row is emitted only when
    * the global watermark passes click_ts + window (Spark evicts the
    * click from join state and emits the null-extended row), so the
    * result is append-only AND complete — the sealed set equals the
    * batch LEFT JOIN exactly.
    *
    * The watermark-seal rows ([[StreamReplay.SENTINEL_TYPE]]) pass
    * BOTH side filters: unmatched-left emission needs the watermark
    * itself to advance, and a sentinel filtered out before the
    * `withWatermark` node would never advance it (the inner join
    * never needed this — its result set is emission-timing-free).
    * Sentinel rows join only each other (reserved user id) and are
    * dropped by the key's sentinel filter. In production the
    * pass-through is inert: no real event carries the reserved type. */
  def clickAttributionOuter(events: DataFrame, windowMinutes: Int = 10): DataFrame = {
    val seal = StreamReplay.SENTINEL_TYPE
    val clicks = events
      .filter(col("event_type") === "click" || col("event_type") === seal)
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", s"$windowMinutes minutes")
    val purchases = events
      .filter(col("event_type") === "purchase" || col("event_type") === seal)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", s"$windowMinutes minutes")
    clicks.join(purchases,
      expr(s"""user_id = p_user
              | AND purchase_ts >= click_ts
              | AND purchase_ts <= click_ts + interval $windowMinutes minutes""".stripMargin),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("purchase_id"), col("value"),
        col("click_ts"), col("purchase_ts"))
  }

  /** Streaming twin of the batch H14 `e_ewma`: per-type daily counts
    * smoothed over the trailing 8 OBSERVED days (α = 1/2), emitted
    * append-only as each day is sealed by the watermark.
    *
    * State per event type is bounded by construction: the open
    * per-day counters inside the watermark horizon plus the last 7
    * sealed counts (the EWMA window) — never stream history. Days
    * seal in ascending order when the watermark passes their end, so
    * the trailing history is identical to the batch lag-chain's row
    * order, and the smoothing arithmetic reproduces the batch
    * expression tree term-for-term (same left-to-right additions of
    * exact dyadic products) — a sealed day's row is bit-identical to
    * the batch twin's whatever the arrival batching was. Late events
    * inside the horizon land in their open day counter; events later
    * than the watermark are dropped by the runtime like every
    * append-mode aggregation here. */
  def dailyEwma(events: Dataset[StreamEvent]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    val dayUs = 86400L * 1000000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (typ: String, batch: Iterator[StreamEvent], state: GroupState[EwmaState]) =>
          val prior = state.getOption.getOrElse(EwmaState(Nil, Nil))
          val openMap = scala.collection.mutable.Map(prior.open: _*)
          batch.foreach { e =>
            val day = micros(e.ts) / dayUs
            openMap.update(day, openMap.getOrElse(day, 0L) + 1L)
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (sealedDays, open) = openMap.toList.partition {
            case (d, _) => (d + 1L) * dayUs <= wmUs
          }
          var hist = prior.hist
          val outs = sealedDays.sortBy(_._1).map { case (d, n) =>
            // the batch twin's expression tree, term for term:
            // ((n + l1*0.5) + l2*0.25) + ... — same IEEE op order
            var num = n.toDouble
            var den = 1.0
            hist.take(7).zipWithIndex.foreach { case (h, i) =>
              num += h.toDouble * math.pow(0.5, i + 1)
              den += math.pow(0.5, i + 1)
            }
            hist = (n :: hist).take(7)
            EwmaOut(typ, java.time.LocalDate.ofEpochDay(d).toString, n, num / den)
          }
          if (open.isEmpty && outs.isEmpty && hist.isEmpty) state.remove()
          else {
            state.update(EwmaState(open.sortBy(_._1), hist))
            if (open.nonEmpty)
              state.setTimeoutTimestamp(open.map(_._1 + 1L).min * dayUs / 1000L)
          }
          outs.iterator
      }
  }
}
