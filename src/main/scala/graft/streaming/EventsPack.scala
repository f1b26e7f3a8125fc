package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType
import graft.{QueryPack, Tables}

/** Events pack (SURVEY §2 H1–H3): batch windowing / sessionization /
  * top-k over the `events` table. The Structured Streaming variants
  * of the same logic live in [[EventStreams]] with their own specs
  * (H4) — this pack is the batch-parity surface the oracle can check.
  *
  * Determinism: money-ish sums use DECIMAL(18,2) leaf casts summed
  * exactly and rounded once (the relational pack's contract); session
  * bounds are emitted as epoch microseconds (exact integers); the
  * session ordering key is the total order (ts, event_id).
  */
object EventsPack extends QueryPack {

  /** The H4/H22/H24/H26 replay surfaces: every key that feeds through
    * the chunked file-source replay machinery (StreamReplay, plus
    * e_stream_ingest's restartable file-landing twin). Registered
    * explicitly so Bench's pre-stage guard and floor-share report key
    * off semantics instead of an `e_stream` name-prefix convention. */
  override val replayBackedKeys: Set[String] = Set(
    "e_stream_window", "e_stream_enrich", "e_stream_sessions",
    "e_stream_ewma", "e_stream_uniques", "e_stream_dedup",
    "e_stream_hh", "e_stream_chain", "e_stream_totals",
    "e_stream_cdc", "e_stream_ingest", "e_stream_attrib",
    "e_stream_outer", "e_stream_incr")

  private val D = DecimalType(18, 2)
  // shared with the streaming twins so batch/stream parity can't drift
  private val SESSION_GAP_US = EventStreams.SESSION_GAP_US // 30 min
  private val WINDOW_SEC = EventStreams.WINDOW_SEC // 5-min tumbling windows
  private val FUNNEL_WINDOW_US = 600L * 1000000L // click→purchase within 10 min

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // H1: tumbling-window aggregation (5-min windows, per event type).
    "e_window" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy(window($"ts", s"$WINDOW_SEC seconds"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
          round(sum($"value".cast(D)), 2).cast("double").as("sum_value"))
        .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"event_type", $"n_events", $"sum_value")
    },

    // H2: sessionization — 30-minute inactivity gap per user; one row
    // per session with bounds and totals.
    "e_sessions" -> { (s, d) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_us".isNull || $"ts_us" - $"prev_us" > SESSION_GAP_US, 1L).otherwise(0L))
        .withColumn("session_id", sum($"new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          min($"ts_us").as("start_us"), max($"ts_us").as("end_us"),
          round(sum($"value".cast(D)), 2).cast("double").as("sum_value"))
    },

    // H17: sessionized CEP pattern matching (MATCH_RECOGNIZE-lite) —
    // per session, the count of CONTIGUOUS view→click→purchase
    // conversion chains in the event-time-ordered type sequence, the
    // complex-event-processing primitive H5/H12 don't cover (H5 is
    // pairwise with a time window, H12 is frequency of ANY 3-gram;
    // this detects a SPECIFIC ordered pattern with a per-entity
    // verdict). The type sequence materializes per SESSION, not per
    // user: the aggregation buffer is gap-bounded like the
    // sessionizer's own state — a user's unbounded history never
    // funnels into one buffer. Matching is a literal scan over the
    // comma-joined sequence (type names are a fixed closed set, so
    // the literal cannot false-match across boundaries); counts and
    // the verdict are exact integers, order pinned by (ts, event_id).
    "e_cep" -> { (s, d) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("prev_us", lag($"ts_us", 1).over(byUser))
        .withColumn("new_session",
          when($"prev_us".isNull || $"ts_us" - $"prev_us" > SESSION_GAP_US, 1L).otherwise(0L))
        .withColumn("session_id", sum($"new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
          expr("array_join(transform(array_sort(collect_list(struct(ts_us, event_id, event_type)))," +
            " x -> x.event_type), ',')").as("seq"))
        .select($"user_id", $"session_id", $"n_events",
          expr("regexp_count(seq, 'view,click,purchase')").cast("long").as("n_conversions"))
        .withColumn("converted", $"n_conversions" >= 1L)
    },

    // H5: funnel attribution — per user, how many purchases follow a
    // click within 10 minutes (the batch twin of the stream-stream
    // click-attribution join in EventStreams.clickAttribution). One
    // per-user window pass carries the last-click timestamp forward;
    // no self-join, so the work is one shuffle on user_id however
    // long the history is.
    "e_funnel" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("last_click_us",
          max(when($"event_type" === "click", $"ts_us")).over(w))
        .filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_purchases"),
          sum(when($"last_click_us".isNotNull &&
              $"ts_us" - $"last_click_us" <= FUNNEL_WINDOW_US, 1L).otherwise(0L))
            .as("n_attributed"))
    },

    // H16: behavioral Markov transition matrix — P(next type | type)
    // from consecutive same-user event pairs (H12's path mining
    // reduced to first order, normalized into probabilities): ONE
    // lead() window pass over the (ts, event_id) total order, then a
    // |types|²-bounded count groupBy and a per-row exact division
    // (both operands are exact BIGINTs, the quotient is ONE IEEE op).
    "e_markov" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      val pairs = Tables.events(s, d)
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("to_type", lead($"event_type", 1).over(w))
        .filter($"to_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"to_type")
        .agg(count(lit(1)).as("n"))
      val fromTotals = pairs.groupBy($"from_type").agg(sum($"n").as("n_from"))
      pairs.join(fromTotals, "from_type")
        .select($"from_type", $"to_type", $"n",
          ($"n".cast("double") / $"n_from".cast("double")).as("p"))
    },

    // H15: multi-touch attribution — every purchase credited equally
    // across ALL clicks in its trailing 10-minute window (H5's
    // last-touch funnel generalized): n_touch from ONE value-based
    // RANGE frame over the user's event-time order (no self-join,
    // no click×purchase pair blowup), credit = 1/n as a single IEEE
    // division. One partition-key shuffle, streaming frame state.
    "e_multitouch" -> { (s, d) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts_us".asc)
        .rangeBetween(-FUNNEL_WINDOW_US, 0)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("n_touch",
          sum(when($"event_type" === "click", 1L).otherwise(0L)).over(w))
        .filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"), $"ts_us", $"n_touch",
          when($"n_touch" > 0L, lit(1.0) / $"n_touch".cast("double"))
            .as("credit_per_click"))
    },

    // H14: EWMA trend smoothing — per-type daily event counts smoothed
    // by an exponentially-weighted moving average over the trailing 8
    // observations (alpha = 1/2). The weights 2^-i are exact dyadic
    // rationals, counts are integers, and the numerator/denominator
    // accumulate in ONE fixed left-to-right expression tree — so every
    // double op is reproduced bit-for-bit by the oracle (same IEEE
    // contract as e_anomaly) with a single division at the end.
    // Scale shape: the window runs on the (type, day) BUCKET table
    // (|types| × |days| rows at any event volume), never the raw
    // stream; the day rollup is one partial-aggregable groupBy.
    // A bounded lag-chain instead of unbounded recursion keeps the
    // frame streaming and the state O(8) per partition.
    "e_ewma" -> { (s, d) =>
      import s.implicits._
      val byType = Window.partitionBy($"event_type").orderBy($"day".asc)
      val days = Tables.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val lags = (1 to 7).foldLeft(days) { (df, i) =>
        df.withColumn(s"l$i", lag($"n", i).over(byType))
      }
      // numerator and denominator built as one explicit left-to-right
      // chain: ((n*1 + l1*0.5) + l2*0.25) + ... — identical tree in SQL
      val num = (1 to 7).foldLeft($"n".cast("double")) { (acc, i) =>
        acc + coalesce(col(s"l$i").cast("double") * lit(math.pow(0.5, i)), lit(0.0))
      }
      val den = (1 to 7).foldLeft(lit(1.0)) { (acc, i) =>
        acc + when(col(s"l$i").isNotNull, lit(math.pow(0.5, i))).otherwise(lit(0.0))
      }
      lags.withColumn("ewma", num / den)
        .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"),
          $"n", $"ewma")
    },

    // H25: day-of-week seasonality index — per (type, dow), the mean
    // daily event count relative to the type's overall mean daily
    // count (the capacity-planning / anomaly-baseline primitive: a
    // Monday index of 1.4 says Mondays run 40% hot). Scale shape:
    // one partial-aggregable rollup to the (type, day) bucket table,
    // then two aggregates on the DOMAIN-bounded buckets — |types| ×
    // |days| rows at any event volume, broadcast-joined back. The
    // index is ONE IEEE division of two exact long products
    // (sum_dow·days_all) / (days_dow·sum_all) — algebraically
    // avg_dow / avg_all with no intermediate double, so both engines
    // emit identical bits before the round. dow alignment: Spark
    // dayofweek() is 1(Sun)..7, DuckDB dayofweek() 0(Sun)..6 —
    // normalized to the 0-based form on the Spark side.
    "e_seasonality" -> { (s, d) =>
      import s.implicits._
      val daily = Tables.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"))
      val byDow = daily
        .withColumn("dow", (dayofweek($"day") - 1).cast("long"))
        .groupBy($"event_type", $"dow")
        .agg(sum($"n").as("s_dow"), count(lit(1)).as("d_dow"))
      val overall = byDow.groupBy($"event_type")
        .agg(sum($"s_dow").as("s_all"), sum($"d_dow").as("d_all"))
      byDow.join(broadcast(overall), Seq("event_type"))
        .select($"event_type", $"dow", $"s_dow", $"d_dow",
          round(($"s_dow" * $"d_all").cast("double") /
            ($"d_dow" * $"s_all").cast("double"), 6).as("season_idx"))
    },

    // H13: windowed distinct users — the batch-parity twin of the
    // streaming HLL sketch (EventStreams.windowedDistinctUsers),
    // putting the graft_hll_* register family on the hard signal:
    // exact per-window uniques ride along with a guarantee boolean
    // (|HLL est − exact| within max(40% ≈ 6σ at m=256, an absolute
    // floor of 3): tiny windows sit in the linear-counting regime
    // where a single register collision among n≈2 users shifts the
    // estimate by ~1 — a purely relative bound is statistically
    // wrong there), which the oracle reproduces as TRUE — a
    // violated bound flips the hash red.
    // Exact count comes from dedup-then-count (not countDistinct in
    // a shared agg — that Expand-doubles input for the other
    // aggregate); HLL registers are computed from the SAME deduped
    // relation (register max is idempotent, so raw vs deduped input
    // is provably identical) — one distinct shuffle, one groupBy.
    "e_window_uniques" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      import graft.functions.GraftFunctions.{hllCard, hllMerge, hllUnit}
      Tables.events(s, d)
        .select(window($"ts", s"$WINDOW_SEC seconds").as("win"), $"user_id")
        .distinct()
        .groupBy($"win")
        .agg(count(lit(1)).as("n_users"),
          hllMerge(hllUnit(xxhash64($"user_id"))).as("regs"))
        .select(date_format($"win.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"n_users",
          (abs(hllCard($"regs") - $"n_users".cast("double")) <=
            greatest(lit(0.4) * $"n_users".cast("double"), lit(3.0))).as("hll_ok"))
    },

    // H11: inter-arrival gap statistics — per-user time between
    // consecutive events (lag over the (ts, event_id) total order).
    // One shuffle on user_id; the aggregate is fully partial (min/
    // max/sum/count over exact epoch-microsecond integers) and the
    // mean is a SINGLE IEEE division over those integers, so both
    // engines produce bit-identical doubles.
    // H20: calendar gap fill + forward fill (time-series resample —
    // the "make the series dense before you chart/model it" step
    // every metrics pipeline needs): per (user, day) purchase
    // revenue on the FULL calendar grid, missing days carrying the
    // last observed value forward. Scale shape: the calendar is a
    // domain-bounded one-row broadcast exploded to |days| rows (the
    // grid is users × bounded-days, smaller than the event table);
    // the daily aggregate is one partial-aggregable groupBy; the
    // forward fill is ONE user-partitioned window pass (last
    // IGNORE NULLS — never a self-join per gap). Filled values are
    // COPIES of already-rounded doubles, so no new arithmetic and
    // the cross-engine hash holds. Leading days before a user's
    // first purchase stay NULL (nothing to fill from).
    "e_fill" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
      val bounds = ev.agg(to_date(min($"ts")).as("d0"), to_date(max($"ts")).as("d1"))
      val days = bounds.select(explode(sequence($"d0", $"d1")).as("day"))
      val users = ev.select($"user_id").distinct()
      val daily = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n_tx"),
          round(sum($"value".cast(D)), 2).cast("double").as("rev"))
      val w = Window.partitionBy($"user_id").orderBy($"day".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      users.crossJoin(broadcast(days))
        .join(daily, Seq("user_id", "day"), "left")
        .withColumn("revenue", last($"rev", ignoreNulls = true).over(w))
        .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"),
          coalesce($"n_tx", lit(0L)).as("n_tx"), $"revenue",
          ($"rev".isNull && $"revenue".isNotNull).as("is_filled"))
    },

    // H23: A/B experiment readout (two-proportion z-test — the
    // experimentation primitive every event pipeline ends in):
    // deterministic arm assignment (user_id parity — stable,
    // engine-independent), per-user conversion (≥1 purchase) in one
    // partial-aggregable groupBy, the two arms folded to ONE row by
    // conditional aggregation, then lift and the pooled z statistic
    // in PINNED IEEE order (each +,×,÷,√ correctly rounded and
    // sequenced identically in the oracle, so even the z value
    // hashes bit-for-bit). Integer counts are the cross-engine
    // anchors; two shuffles total (user fold, two-row fold) at any
    // scale.
    "e_abtest" -> { (s, d) =>
      import s.implicits._
      val u = Tables.events(s, d).groupBy($"user_id")
        .agg(max(when($"event_type" === "purchase", 1L).otherwise(0L)).as("conv"))
        .withColumn("arm", pmod($"user_id", lit(2L)))
      val m = u.groupBy($"arm").agg(count(lit(1)).as("n"), sum($"conv").as("k"))
      val r = m.agg(
        sum(when($"arm" === 0L, $"n")).as("n_a"),
        sum(when($"arm" === 0L, $"k")).as("k_a"),
        sum(when($"arm" === 1L, $"n")).as("n_b"),
        sum(when($"arm" === 1L, $"k")).as("k_b"))
      val pa = $"k_a".cast("double") / $"n_a".cast("double")
      val pb = $"k_b".cast("double") / $"n_b".cast("double")
      val pp = ($"k_a" + $"k_b").cast("double") / ($"n_a" + $"n_b").cast("double")
      // degenerate experiment (0% or 100% pooled conversion): the
      // pooled variance is exactly 0 and z is undefined — NULL on
      // both sides, never a 0/0 (which ANSI Spark raises on and
      // DuckDB folds to NaN: a cross-engine divergence either way)
      val se2 = pp * (lit(1.0) - pp) *
        (lit(1.0) / $"n_a".cast("double") + lit(1.0) / $"n_b".cast("double"))
      r.select($"n_a", $"k_a", $"n_b", $"k_b",
        pa.as("rate_a"), pb.as("rate_b"), (pb - pa).as("lift"),
        when(se2 > 0.0, (pb - pa) / sqrt(se2))
          .otherwise(lit(null).cast("double")).as("z"))
    },

    // H21: time-weighted average (TWAP — the correct mean for
    // irregularly-sampled series: each observation weighted by how
    // long it was the CURRENT value, so burst-sampling can't bias
    // the average the way a plain mean does): per user, the step
    // function of `value` integrated over the user's own timeline.
    // Exact arithmetic end-to-end — cent-quantized values × integer
    // microsecond durations summed as DECIMAL(38,0) (vs the oracle's
    // HUGEINT), ONE IEEE division at the end. One window pass (lead)
    // and one groupBy, both partitioned on user_id, so the hash
    // exchange is reused: ONE shuffle total.
    "e_twa" -> { (s, d) =>
      import s.implicits._
      val d38 = DecimalType(38, 0)
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      Tables.events(s, d)
        .select($"user_id", $"event_id", unix_micros($"ts").as("ts_us"),
          ($"value".cast(D) * 100).cast("long").as("cents"))
        .withColumn("dur_us", lead($"ts_us", 1).over(byUser) - $"ts_us")
        .filter($"dur_us".isNotNull)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"dur_us").as("total_us"),
          sum($"cents".cast(d38) * $"dur_us".cast(d38)).as("num"))
        .select($"user_id", $"n_intervals",
          ($"num".cast("double") / (lit(100.0) * $"total_us".cast("double"))).as("twa"))
    },

    "e_gaps" -> { (s, d) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(byUser))
        .filter($"gap_us".isNotNull)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_gaps"),
          min($"gap_us").as("min_gap_us"),
          max($"gap_us").as("max_gap_us"),
          sum($"gap_us").as("sum_gap_us"))
        .withColumn("avg_gap_us", $"sum_gap_us".cast("double") / $"n_gaps".cast("double"))
    },

    // H18: RFM customer segmentation — recency / frequency / monetary
    // scores with EMPIRICAL tertile thresholds, computed scale-safely:
    // every metric is quantized onto a domain-bounded grid (recency in
    // whole days, frequency an integer, monetary floored to whole
    // units), the three value-distribution histograms ride ONE
    // groupBy on a bounded key set, and the tertile cut points come
    // from a cumulative-count window over those bounded histograms —
    // so the global quantiles never need a global sort of users, and
    // the final scoring join is a 1-row broadcast. Threshold rule is
    // exact integer arithmetic (percentile-disc: smallest v with
    // cum ≥ ceil(k·n/3), ceil via (k·n+2) div 3), so both engines
    // agree bit-for-bit.
    "e_rfm" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros($"ts"))
      val obsEnd = ev.agg(max($"ts_us").as("obs_end_us"))
      val base = ev.filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(max($"ts_us").as("last_us"), count(lit(1)).as("frequency"),
          sum($"value".cast(D)).as("mon_d"))
        .crossJoin(broadcast(obsEnd))
        .select($"user_id",
          expr("(obs_end_us - last_us) div 86400000000").as("recency_days"),
          $"frequency",
          floor($"mon_d").cast("long").as("monetary_units"),
          round($"mon_d", 2).cast("double").as("monetary"))
      val melted = base.select(expr(
        "stack(3, 'r', recency_days, 'f', frequency, 'm', monetary_units) AS (metric, v)"))
      val wcum = Window.partitionBy($"metric").orderBy($"v".asc)
      val cum = melted.groupBy($"metric", $"v").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum($"c").over(
          wcum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum($"c").over(Window.partitionBy($"metric")))
      val th = cum.groupBy($"metric").agg(
        min(when($"cum" >= expr("(n + 2) div 3"), $"v")).as("t1"),
        min(when($"cum" >= expr("(2 * n + 2) div 3"), $"v")).as("t2"))
      val thRow = th.groupBy().pivot("metric", Seq("r", "f", "m"))
        .agg(first($"t1").as("t1"), first($"t2").as("t2"))
      base.crossJoin(broadcast(thRow))
        .select($"user_id", $"recency_days", $"frequency", $"monetary",
          when($"recency_days" <= $"r_t1", 3L)
            .when($"recency_days" <= $"r_t2", 2L).otherwise(1L).as("r_score"),
          when($"frequency" <= $"f_t1", 1L)
            .when($"frequency" <= $"f_t2", 2L).otherwise(3L).as("f_score"),
          when($"monetary_units" <= $"m_t1", 1L)
            .when($"monetary_units" <= $"m_t2", 2L).otherwise(3L).as("m_score"))
        .withColumn("rfm", concat($"r_score".cast("string"),
          $"f_score".cast("string"), $"m_score".cast("string")))
    },

    // H19: Kaplan–Meier time-to-conversion survival curve — per-user
    // duration from first signup to first subsequent purchase
    // (censored at the observation end when no purchase follows),
    // then the KM estimator over the day grid: at each event time t,
    // n_risk (users whose duration ≥ t), n_events, n_censored,
    // hazard = n_events/n_risk (ONE IEEE division), and the survival
    // product S(t) = Π(1 − d_i/n_i) computed by a quantized
    // fold (each step: one IEEE multiply, then round to 12 decimals —
    // the PageRank determinism contract applied to a recurrence) so
    // both engines emit identical doubles. Scale shape: per-user
    // durations are one groupBy on user_id; the curve itself lives on
    // the DOMAIN-BOUNDED day grid (observation span in days), so the
    // reverse-cumulative risk window and the fold array are bounded
    // regardless of user count — same argument as q_skyline's band
    // summary.
    "e_survival" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d).withColumn("ts_us", unix_micros($"ts"))
      val obsEnd = ev.agg(max($"ts_us").as("obs_end_us"))
      val signup = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts_us").as("t0_us"))
      val firstPurchase = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts_us")
      val durations = signup
        .join(firstPurchase.as("p"), Seq("user_id"), "left")
        .groupBy($"user_id", $"t0_us")
        .agg(min(when($"p.ts_us" > $"t0_us", $"p.ts_us")).as("tp_us"))
        .crossJoin(broadcast(obsEnd))
        .select($"user_id",
          when($"tp_us".isNotNull,
            expr("(tp_us - t0_us) div 86400000000"))
            .otherwise(expr("(obs_end_us - t0_us) div 86400000000")).as("t_days"),
          $"tp_us".isNotNull.as("observed"))
      val grid = durations.groupBy($"t_days")
        .agg(sum(when($"observed", 1L).otherwise(0L)).as("n_events"),
          sum(when($"observed", 0L).otherwise(1L)).as("n_censored"))
      // reverse-cumulative risk set over the bounded day grid
      val wRisk = Window.orderBy($"t_days".asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val km = grid
        .withColumn("n_risk", sum($"n_events" + $"n_censored").over(wRisk))
        .filter($"n_events" > 0)
      // quantized survival fold over the (bounded) ordered curve
      val folded = km
        .agg(sort_array(collect_list(struct($"t_days", $"n_events", $"n_censored",
          $"n_risk"))).as("pts"))
        .select(explode(expr(
          """aggregate(pts,
            |  struct(CAST(array() AS ARRAY<STRUCT<t_days: BIGINT, n_events: BIGINT,
            |    n_censored: BIGINT, n_risk: BIGINT, survival: DECIMAL(28,12)>>) AS acc,
            |    CAST(1 AS DECIMAL(28,12)) AS s),
            |  (st, x) -> struct(
            |    array_append(st.acc, struct(x.t_days, x.n_events, x.n_censored, x.n_risk,
            |      CAST(CAST(st.s AS DOUBLE) * (CAST(1 AS DOUBLE) -
            |        CAST(x.n_events AS DOUBLE) / CAST(x.n_risk AS DOUBLE))
            |        AS DECIMAL(28,12)) AS survival)),
            |    CAST(CAST(st.s AS DOUBLE) * (CAST(1 AS DOUBLE) -
            |      CAST(x.n_events AS DOUBLE) / CAST(x.n_risk AS DOUBLE))
            |      AS DECIMAL(28,12))),
            |  st -> st.acc)""".stripMargin)).as("r"))
      folded.select($"r.t_days", $"r.n_events", $"r.n_censored", $"r.n_risk",
        ($"r.n_events".cast("double") / $"r.n_risk".cast("double")).as("hazard"),
        $"r.survival".cast("double").as("survival"))
    },

    // H12: behavioral path mining — the 10 most common 3-step
    // event-type sequences (per-user order by (ts, event_id), two
    // lead()s in ONE window pass — no self-joins). The trigram
    // key space is bounded by |event_type|^3, so the count groupBy
    // shuffles a bounded key set however large the event log is.
    "e_paths" -> { (s, d) =>
      import s.implicits._
      val byUser = Window.partitionBy($"user_id").orderBy($"ts_us".asc, $"event_id".asc)
      Tables.events(s, d)
        .withColumn("ts_us", unix_micros($"ts"))
        .withColumn("t2", lead($"event_type", 1).over(byUser))
        .withColumn("t3", lead($"event_type", 2).over(byUser))
        .filter($"t3".isNotNull)
        .select(concat_ws(">", $"event_type", $"t2", $"t3").as("path"))
        .groupBy($"path").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"path".asc).limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy($"n".desc, $"path".asc)).cast("long"))
        .select($"rank", $"path", $"n")
    },

    // H6: cohort retention — users grouped by first-seen day, counted
    // per day-offset from that cohort day (the standard product-
    // analytics retention matrix). Two partial-aggregable groupBys on
    // user_id plus one on the (cohort, offset) pair; the distinct
    // (user, day) reduction happens map-side before any join.
    "e_retention" -> { (s, d) =>
      import s.implicits._
      val days = Tables.events(s, d)
        .select($"user_id", to_date($"ts").as("day")).distinct()
      val cohorts = days.groupBy($"user_id").agg(min($"day").as("cohort_day"))
      days.join(cohorts, "user_id")
        .withColumn("day_offset", datediff($"day", $"cohort_day").cast("long"))
        .groupBy($"cohort_day", $"day_offset")
        .agg(count_distinct($"user_id").as("n_users"))
        .select(date_format($"cohort_day", "yyyy-MM-dd").as("cohort_day"),
          $"day_offset", $"n_users")
    },

    // H7 (C-surface on events): pivot — per-user event-type matrix as
    // conditional aggregation. Catalyst compiles `pivot` into ONE
    // hash aggregate with a CASE per (pivot value × agg), so the plan
    // is a single partial-aggregable groupBy regardless of how many
    // columns the matrix has — no per-type scans, no join.
    "e_pivot" -> { (s, d) =>
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      val pivoted = Tables.events(s, d)
        .groupBy($"user_id")
        .pivot("event_type", types)
        .agg(count(lit(1)).as("n"),
          round(sum($"value".cast(D)), 2).cast("double").as("sum_value"))
      // count of an absent (user, type) combo is null under pivot but
      // 0 under the oracle's FILTER aggregate — align on 0.
      val cols = $"user_id" +: types.flatMap(t => Seq(
        coalesce(col(s"${t}_n"), lit(0L)).as(s"${t}_n"),
        col(s"${t}_sum_value")))
      pivoted.select(cols: _*)
    },

    // H8: volume-spike detection — per (event_type, hour) counts
    // flagged when a bucket runs at more than 2× its type's mean
    // hourly rate. The comparison is EXACT integer cross-multiplication
    // (n · n_buckets > 2 · total), not a float mean ± stddev, so both
    // engines flag identically and the operator composes into alert
    // pipelines without tolerance knobs. Scale shape: one
    // partial-aggregable (type, hour) count, a per-type rollup over
    // the bucket table (bucket-scaled, not event-scaled), one
    // broadcastable join back.
    "e_spike" -> { (s, d) =>
      import s.implicits._
      val hours = Tables.events(s, d)
        .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
        .agg(count(lit(1)).as("n"))
      val typ = hours.groupBy($"event_type")
        .agg(sum($"n").as("total"), count(lit(1)).as("n_buckets"))
      hours.join(typ, "event_type")
        .select($"event_type",
          date_format($"h", "yyyy-MM-dd HH:mm:ss").as("hour"),
          $"n", ($"n" * $"n_buckets" > $"total" * 2).as("spike"))
    },

    // H10: robust anomaly detection — per (event_type, day) counts
    // scored by the median/MAD robust z-score (the outlier detector
    // that, unlike mean/stddev, is not dragged by the outliers it is
    // trying to find). Two percentile aggregations, but both run on
    // the DAY-BUCKET table (|types| × |days| rows — bucket-scaled,
    // never event-scaled), so the per-type sort inside `percentile`
    // touches a dimension-sized input at any corpus size; the event
    // scan itself reduces map-side into the bucket counts. z is pure
    // IEEE double arithmetic over exactly-representable inputs
    // (integer counts; interpolated medians are multiples of 0.5), so
    // both engines produce bit-identical scores.
    "e_anomaly" -> { (s, d) =>
      import s.implicits._
      val days = Tables.events(s, d)
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // consumed by med, dev and the final join
      val med = days.groupBy($"event_type")
        .agg(percentile($"n", lit(0.5)).as("med"))
      val dev = days.join(med, "event_type")
        .groupBy($"event_type")
        .agg(percentile(abs($"n" - $"med"), lit(0.5)).as("mad"))
      days.join(med, "event_type").join(dev, "event_type")
        .withColumn("robust_z",
          when($"mad" > 0.0, round(($"n" - $"med") / (lit(1.4826) * $"mad"), 6)))
        .select($"event_type", date_format($"day", "yyyy-MM-dd").as("day"), $"n",
          $"med", $"mad", $"robust_z",
          ($"mad" > 0.0 && abs($"robust_z") > 3.0).as("anomaly"))
    },

    // H9: engagement stickiness — per active day, DAU, trailing-7-day
    // WAU, and DAU/WAU (one IEEE division of exact counts). The WAU
    // window is computed WITHOUT a range join: each (day, user)
    // activity row fans out to the ≤7 window-days it counts toward (a
    // bounded explode), then dedups — shuffles scale with activity ×
    // 7, never with pair counts. Product-analytics staple over the
    // event stream.
    "e_stickiness" -> { (s, d) =>
      import s.implicits._
      val ud = Tables.events(s, d)
        .select(to_date($"ts").as("day"), $"user_id").distinct()
        .localCheckpoint(false) // two consumers: DAU + window fan-out
      val dau = ud.groupBy($"day").agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(explode(sequence($"day", date_add($"day", 6))).as("day"), $"user_id")
        .distinct()
        .groupBy($"day").agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(date_format($"day", "yyyy-MM-dd").as("day"), $"dau", $"wau",
          ($"dau".cast("double") / $"wau".cast("double")).as("stickiness"))
    },

    // H3: top-k users by total value (total-order ranked). The top 20
    // are taken with orderBy+limit — TakeOrderedAndProject keeps a
    // bounded heap per partition and never globally sorts — and only
    // the 20 survivors pass through the single-partition ranking
    // window (a global ROW_NUMBER before the cut would funnel every
    // user through one partition).
    "e_topk" -> { (s, d) =>
      import s.implicits._
      Tables.events(s, d)
        .groupBy($"user_id")
        .agg(sum($"value".cast(D)).as("total_dec"), count(lit(1)).as("n_events"))
        .orderBy($"total_dec".desc, $"user_id".asc)
        .limit(20)
        .withColumn("rank", row_number().over(
          Window.orderBy($"total_dec".desc, $"user_id".asc)).cast("long"))
        .select($"rank", $"user_id", round($"total_dec", 2).cast("double").as("total_value"),
          $"n_events")
    },

    // H4 on the hard signal: the Structured Streaming operators
    // replayed over the events table TO COMPLETION (multi-chunk
    // MemoryStream replay, watermark advanced between micro-batches,
    // far-future sentinel sealing every window/session/day — see
    // [[StreamReplay]]), oracled by the IDENTICAL SQL as their batch
    // twins. Streaming state merging across batches, append-mode
    // sealing, and the exact-cents money contract are all inside the
    // hash compare — a drift between the incremental and batch
    // formulations flips the driver's gate red.
    "e_stream_window" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d)(ds => EventStreams.windowedCounts(ds.toDF())) {
        out => out.filter($"event_type" =!= StreamReplay.SENTINEL_TYPE)
      }
    },

    // Streaming stream-static enrichment replay (H22): events joined
    // against the static customer dimension INSIDE the streaming
    // query, aggregated per (window, market segment). Stream-static
    // joins keep no state (the static side re-plans per micro-batch),
    // so the sealed output equals the batch join+group twin exactly;
    // the sentinel has no dimension row, so the inner join drops its
    // data while its event time still advances the watermark.
    "e_stream_enrich" -> { (s, d) =>
      import s.implicits._
      val dim = Tables.customer(s, d).select($"c_custkey", $"c_mktsegment")
      StreamReplay.replay(s, d)(
        ds => EventStreams.enrichStaticWindowed(ds.toDF(), dim))(identity)
    },

    // Streaming sessionization replay: SessionOut rows carry no
    // session_id (state seals sessions independently), so the batch
    // twin's per-user id is re-derived by ranking each user's sealed
    // sessions by start time — sessions of one user are disjoint and
    // gap-separated, so start order IS the batch new_session running
    // count. The ranking window runs on the sessions-sized OUTPUT.
    "e_stream_sessions" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d)(ds => EventStreams.sessionize(ds).toDF()) { out =>
        out.filter($"user_id" =!= StreamReplay.SENTINEL_USER)
          .withColumn("session_id", row_number().over(
            Window.partitionBy($"user_id").orderBy($"start_us".asc)).cast("long"))
          .select($"user_id", $"session_id", $"n_events",
            $"start_us", $"end_us", $"sum_value")
      }
    },

    // Streaming daily-EWMA replay: dailyEwma's sealed days must
    // reproduce e_ewma's lag-chain expression tree term-for-term
    // (bit-identical doubles), so the SAME ewmaSql oracle hashes both.
    "e_stream_ewma" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d)(ds => EventStreams.dailyEwma(ds).toDF()) {
        out => out.filter($"event_type" =!= StreamReplay.SENTINEL_TYPE)
          .select($"event_type", $"day", $"n", $"ewma")
      }
    },

    // Streaming HLL sketch replay: windowedDistinctUsers' 256-byte
    // per-window register state, merged incrementally across the
    // replay's micro-batches, must estimate the SAME cardinalities as
    // the batch sketch (register max is idempotent and order-free, so
    // batch-vs-stream register equality is exact, not approximate).
    // Emitted in e_window_uniques' guarantee shape: exact per-window
    // uniques (cross-engine) + the |est − exact| ≤ max(0.4n, 3)
    // boolean the oracle reproduces as TRUE — a streaming-state bug
    // that inflated or dropped registers flips the hash red. The
    // inner join on window_start naturally drops the sentinel's
    // far-future window (the batch side never saw the sentinel).
    "e_stream_uniques" -> { (s, d) =>
      import s.implicits._
      val streamed = StreamReplay.replay(s, d)(
        ds => EventStreams.windowedDistinctUsers(ds.toDF()))(identity)
      Tables.events(s, d)
        .select(window($"ts", s"$WINDOW_SEC seconds").as("win"), $"user_id")
        .distinct()
        .groupBy($"win").agg(count(lit(1)).as("n_users"))
        .select(date_format($"win.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"n_users")
        .join(streamed, Seq("window_start"))
        .select($"window_start", $"n_users",
          (abs($"est_users" - $"n_users".cast("double")) <=
            greatest(lit(0.4) * $"n_users".cast("double"), lit(3.0))).as("hll_ok"))
    },

    // Streaming dedup replay: dropDuplicatesWithinWatermark on the
    // (user, type, 5-min window) activity key. Exactness argument
    // (see [[EventStreams.dedupActivityKeys]]): key duplicates span
    // ≤ 5 min of event time < the 10-min watermark delay, and the
    // sorted-contiguous replay means a key's dedup state is always
    // still alive when its next duplicate arrives — so the sealed
    // key set equals the batch DISTINCT exactly, independent of
    // chunking AND of which physical row won (only key columns are
    // emitted). The D1 operator's incremental form on the hard gate.
    "e_stream_dedup" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d)(ds => EventStreams.dedupActivityKeys(ds.toDF())) {
        out => out.filter($"event_type" =!= StreamReplay.SENTINEL_TYPE)
      }
    },

    // Streaming windowed heavy-hitters replay — C15's discipline
    // applied to the stream: a Misra-Gries summary's VALUES (and even
    // its surviving item set) depend on merge order, so the raw
    // summary can't hash-compare; its GUARANTEES are order-free and
    // provable per window against exact batch counts. Emitted per
    // window: the exact event count (cross-engine anchor), the MG
    // sandwich est ≤ true ≤ est + max_err over every reported item,
    // and the coverage bound — every user with count > n/(cap+1)
    // appears in the summary. A streaming-state bug that corrupted a
    // counter through an inter-batch merge, or dropped a heavy item,
    // flips a boolean and the driver's hash goes red. The exact-count
    // side runs batch (it's the oracle anchor, not streaming state).
    "e_stream_hh" -> { (s, d) =>
      import s.implicits._
      val cap = 32
      val streamed = StreamReplay.replay(s, d)(
        ds => EventStreams.windowedHeavyHitters(ds.toDF(), cap))(identity)
        .select($"window_start", $"user_id", $"est_count", $"max_err")
      val perUser = Tables.events(s, d)
        .select(date_format(timestamp_seconds(
          expr(s"unix_micros(ts) div ${WINDOW_SEC * 1000000L} * $WINDOW_SEC")),
          "yyyy-MM-dd HH:mm:ss").as("window_start"), $"user_id")
        .groupBy($"window_start", $"user_id").agg(count(lit(1)).as("true_cnt"))
        .localCheckpoint(false) // consumed by totals, sandwich and coverage
      val winTot = perUser.groupBy($"window_start")
        .agg(sum($"true_cnt").as("n_events"))
      val sandwich = streamed
        .join(perUser, Seq("window_start", "user_id"), "left")
        .groupBy($"window_start")
        .agg(expr("bool_and(true_cnt IS NOT NULL AND est_count <= true_cnt " +
          "AND true_cnt <= est_count + max_err)").as("sandwich_ok"))
      val misses = perUser.join(winTot, "window_start")
        .filter($"true_cnt" * (cap + 1) > $"n_events")
        .join(streamed, Seq("window_start", "user_id"), "left_anti")
        .groupBy($"window_start").agg(count(lit(1)).as("n_missed"))
      // inner joins on the batch-side window set drop the sentinel's
      // far-future window (the batch side never saw the sentinel)
      winTot.join(sandwich, "window_start")
        .join(misses, Seq("window_start"), "left")
        .select($"window_start", $"n_events", $"sandwich_ok",
          coalesce($"n_missed", lit(0L)).===(0L).as("coverage_ok"))
    },

    // CHAINED stateful replay: dedup → windowed agg composed in ONE
    // streaming query under one watermark (two state stores, the
    // second consuming the first's in-batch output) — the multi-stage
    // composition production pipelines trip on. Sealed output equals
    // the batch per-window COUNT(DISTINCT user) by the e_stream_dedup
    // exactness argument + append-mode window sealing.
    "e_stream_chain" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d)(ds => EventStreams.dedupThenWindowCounts(ds.toDF())) {
        out => out.filter($"event_type" =!= StreamReplay.SENTINEL_TYPE)
      }
    },

    // Streaming running-totals replay — the H3 feeder as COMPLETE-mode
    // incremental aggregation: per-user (count, exact-decimal sum)
    // state merged across micro-batches, the memory sink's final
    // emission compared against the batch GROUP BY. Complete mode's
    // sink holds the USER-dimension table (never the event stream);
    // the decimal-cents sum is order-free, so incremental merging is
    // exactly the batch result. Closes the last spec-only H4 surface.
    "e_stream_totals" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d, mode = OutputMode.Complete())(
        ds => EventStreams.userTotals(ds.toDF())) {
        out => out.filter($"user_id" =!= StreamReplay.SENTINEL_USER)
      }
    },

    // Streaming incremental aggregate maintenance (round 15 —
    // verdict optional 8, H27): C34's merge algebra IS Spark's
    // streaming state-store contract, so the complete-mode twin
    // maintained per micro-batch puts the IVM law (merge ≡ full
    // recompute) on the replay harness — the oracle is the batch
    // GROUP BY over all events, hash-exact. See
    // EventStreams.incrAggState for the min/max inserts-only note.
    "e_stream_incr" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d, mode = OutputMode.Complete())(
        ds => EventStreams.incrAggState(ds.toDF())) {
        out => out.filter($"event_type" =!= StreamReplay.SENTINEL_TYPE)
      }
    },

    // Streaming CDC materialization replay (H24): C28's tombstone
    // semantics maintained INCREMENTALLY — the replayed stream's
    // final state table must equal the batch q_cdc exactly (same
    // oracle SQL verbatim). The tombstone filter runs on the final
    // output, never inside the state (a later upsert must revive a
    // deleted key mid-stream).
    "e_stream_cdc" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d, mode = OutputMode.Complete())(
        ds => EventStreams.cdcState(ds.toDF())) {
        out => out.filter($"user_id" =!= StreamReplay.SENTINEL_USER &&
          $"last_type" =!= "error")
      }
    },

    // File-source ingest on the hard signal: events land as JSONL
    // files in two waves with a query stop/RESTART between them; the
    // checkpointed parquet sink must contain exactly the batch row
    // set — exactly-once across the restart, proven by the hash (see
    // [[StreamingIngest.replayFileIngest]]).
    "e_stream_ingest" -> { (s, d) => StreamingIngest.replayFileIngest(s, d) },

    // Stream-stream JOIN replay: clickAttribution's two-sided
    // watermarked inner join (each purchase matched to same-user
    // clicks in the preceding 10 minutes, click state evicted once
    // the purchase watermark passes click_ts + window) replayed to
    // completion must emit exactly the batch join's pair set — the
    // oracle is the plain SQL interval join. Timestamps emit as
    // exact epoch micros.
    "e_stream_attrib" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d)(ds => EventStreams.clickAttribution(ds.toDF())) { out =>
        out.filter($"user_id" =!= StreamReplay.SENTINEL_USER)
          .select($"user_id", $"click_id", $"purchase_id",
            round($"value".cast(D), 2).cast("double").as("value"),
            unix_micros($"click_ts").as("click_us"),
            unix_micros($"purchase_ts").as("purchase_us"))
      }
    },

    // Stream-stream LEFT OUTER interval join replay (H26): every
    // click with its in-window purchase OR null-extended once the
    // watermark proves no purchase can arrive — unmatched-left
    // emission is watermark-GATED (Spark emits the null row when it
    // evicts the click from join state), which is exactly what the
    // double-sentinel seal flushes. The sealed set equals the plain
    // SQL LEFT JOIN; nullable purchase columns ride the hash compare
    // in both engines.
    "e_stream_outer" -> { (s, d) =>
      import s.implicits._
      StreamReplay.replay(s, d)(ds => EventStreams.clickAttributionOuter(ds.toDF())) { out =>
        out.filter($"user_id" =!= StreamReplay.SENTINEL_USER)
          .select($"user_id", $"click_id", $"purchase_id",
            round($"value".cast(D), 2).cast("double").as("value"),
            unix_micros($"click_ts").as("click_us"),
            unix_micros($"purchase_ts").as("purchase_us"),
            $"purchase_id".isNotNull.as("converted"))
      }
    },
  )

  /** The e_ewma smoothing expression, shared-shape with the Spark
    * plan: one left-to-right chain so IEEE addition order matches. */
  private val ewmaSql: String = {
    val num = (1 to 7).foldLeft("CAST(n AS DOUBLE)") { (acc, i) =>
      s"($acc + COALESCE(CAST(l$i AS DOUBLE) * ${math.pow(0.5, i)}, 0.0))"
    }
    val den = (1 to 7).foldLeft("1.0") { (acc, i) =>
      s"($acc + CASE WHEN l$i IS NOT NULL THEN ${math.pow(0.5, i)} ELSE 0.0 END)"
    }
    val lagCols = (1 to 7).map(i =>
      s"lag(n, $i) OVER (PARTITION BY event_type ORDER BY day) AS l$i").mkString(", ")
    s"""WITH days AS (
       | SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
       | FROM events GROUP BY 1, 2),
       |lags AS (SELECT event_type, day, n, $lagCols FROM days)
       |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
       | $num / $den AS ewma
       |FROM lags""".stripMargin
  }

  /** e_window's oracle — shared verbatim with the streaming replay
    * twin (the replay promises set equality with the batch result). */
  private val windowSql: String =
    s"""SELECT
       | strftime(make_timestamp(CAST(floor(epoch(ts) / $WINDOW_SEC) * $WINDOW_SEC AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
       | event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
       |FROM events GROUP BY 1, 2""".stripMargin

  /** e_window_uniques' oracle — shared verbatim with the streaming
    * HLL replay (same exact counts, same TRUE guarantee literal). */
  private val windowUniquesSql: String =
    s"""SELECT
       | strftime(make_timestamp(CAST(floor(epoch(ts) / $WINDOW_SEC) * $WINDOW_SEC AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
       | CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       | TRUE AS hll_ok
       |FROM events GROUP BY 1""".stripMargin

  /** e_sessions' oracle — shared verbatim with the streaming replay. */
  private val sessionsSql: String =
    s"""WITH base AS (
       | SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
       |  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev_us
       | FROM events),
       |flagged AS (
       | SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > $SESSION_GAP_US THEN 1 ELSE 0 END AS new_session
       | FROM base),
       |sess AS (
       | SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
       |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
       | FROM flagged)
       |SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       | MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
       |FROM sess GROUP BY user_id, session_id""".stripMargin

  override def oracles: Map[String, String] = Map(
    "e_ewma" -> ewmaSql,
    "e_seasonality" ->
      """WITH daily AS (
        | SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        | FROM events GROUP BY 1, 2),
        |dw AS (
        | SELECT event_type, CAST(dayofweek(day) AS BIGINT) AS dow,
        |  CAST(SUM(n) AS BIGINT) AS s_dow, CAST(COUNT(*) AS BIGINT) AS d_dow
        | FROM daily GROUP BY 1, 2),
        |o AS (
        | SELECT event_type, CAST(SUM(s_dow) AS BIGINT) AS s_all,
        |  CAST(SUM(d_dow) AS BIGINT) AS d_all
        | FROM dw GROUP BY 1)
        |SELECT dw.event_type, dw.dow, dw.s_dow, dw.d_dow,
        | round(CAST(dw.s_dow * o.d_all AS DOUBLE) / CAST(dw.d_dow * o.s_all AS DOUBLE), 6) AS season_idx
        |FROM dw JOIN o ON o.event_type = dw.event_type""".stripMargin,
    // the streaming replays promise EQUALITY with their batch twins,
    // so they share the twins' oracle SQL verbatim
    "e_stream_ewma" -> ewmaSql,
    // the stream-stream join's batch characterization: the plain
    // interval join over the same click/purchase split
    "e_stream_attrib" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        | CAST(ROUND(CAST(p.value AS DECIMAL(18,2)), 2) AS DOUBLE) AS value,
        | epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us
        |FROM events c JOIN events p
        | ON p.user_id = c.user_id
        | AND c.event_type = 'click' AND p.event_type = 'purchase'
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 600000000""".stripMargin,
    "e_stream_outer" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        | CAST(ROUND(CAST(p.value AS DECIMAL(18,2)), 2) AS DOUBLE) AS value,
        | epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us,
        | p.event_id IS NOT NULL AS converted
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        | ON p.user_id = c.user_id
        | AND epoch_us(p.ts) >= epoch_us(c.ts)
        | AND epoch_us(p.ts) <= epoch_us(c.ts) + 600000000""".stripMargin,
    // the session derivation is sessionsSql's verbatim; the ordered
    // type sequence via string_agg ORDER BY, the literal chain count
    // via regexp_extract_all
    "e_cep" ->
      s"""WITH base AS (
         | SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |flagged AS (
         | SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
         |   OR ts_us - lag(ts_us) OVER w > $SESSION_GAP_US THEN 1 ELSE 0 END AS new_session
         | FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
         |sess AS (
         | SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
         |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         | FROM flagged),
         |seqs AS (
         | SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         |  string_agg(event_type, ',' ORDER BY ts_us ASC, event_id ASC) AS seq
         | FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, session_id, n_events,
         | CAST(len(regexp_extract_all(seq, 'view,click,purchase')) AS BIGINT) AS n_conversions,
         | len(regexp_extract_all(seq, 'view,click,purchase')) >= 1 AS converted
         |FROM seqs""".stripMargin,
    "e_rfm" ->
      """WITH ev AS (SELECT user_id, event_type, value, epoch_us(ts) AS ts_us FROM events),
        |mx AS (SELECT MAX(ts_us) AS obs_end_us FROM ev),
        |base AS (
        | SELECT user_id,
        |  CAST((mx.obs_end_us - MAX(ts_us)) // 86400000000 AS BIGINT) AS recency_days,
        |  CAST(COUNT(*) AS BIGINT) AS frequency,
        |  CAST(FLOOR(SUM(CAST(value AS DECIMAL(18,2)))) AS BIGINT) AS monetary_units,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS monetary
        | FROM ev CROSS JOIN mx WHERE event_type = 'purchase'
        | GROUP BY user_id, mx.obs_end_us),
        |melted AS (
        | SELECT 'r' AS metric, recency_days AS v FROM base
        | UNION ALL SELECT 'f', frequency FROM base
        | UNION ALL SELECT 'm', monetary_units FROM base),
        |cum AS (
        | SELECT metric, v,
        |  SUM(c) OVER (PARTITION BY metric ORDER BY v ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  SUM(c) OVER (PARTITION BY metric) AS n
        | FROM (SELECT metric, v, COUNT(*) AS c FROM melted GROUP BY 1, 2)),
        |th AS (
        | SELECT metric,
        |  MIN(CASE WHEN cum >= (n + 2) // 3 THEN v END) AS t1,
        |  MIN(CASE WHEN cum >= (2 * n + 2) // 3 THEN v END) AS t2
        | FROM cum GROUP BY metric),
        |tr AS (SELECT
        | MAX(CASE WHEN metric = 'r' THEN t1 END) AS r_t1, MAX(CASE WHEN metric = 'r' THEN t2 END) AS r_t2,
        | MAX(CASE WHEN metric = 'f' THEN t1 END) AS f_t1, MAX(CASE WHEN metric = 'f' THEN t2 END) AS f_t2,
        | MAX(CASE WHEN metric = 'm' THEN t1 END) AS m_t1, MAX(CASE WHEN metric = 'm' THEN t2 END) AS m_t2
        | FROM th),
        |scored AS (
        | SELECT user_id, recency_days, frequency, monetary,
        |  CAST(CASE WHEN recency_days <= r_t1 THEN 3 WHEN recency_days <= r_t2 THEN 2 ELSE 1 END AS BIGINT) AS r_score,
        |  CAST(CASE WHEN frequency <= f_t1 THEN 1 WHEN frequency <= f_t2 THEN 2 ELSE 3 END AS BIGINT) AS f_score,
        |  CAST(CASE WHEN monetary_units <= m_t1 THEN 1 WHEN monetary_units <= m_t2 THEN 2 ELSE 3 END AS BIGINT) AS m_score
        | FROM base CROSS JOIN tr)
        |SELECT *, CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR) || CAST(m_score AS VARCHAR) AS rfm
        |FROM scored""".stripMargin,
    "e_survival" ->
      """WITH RECURSIVE ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |mx AS (SELECT MAX(ts_us) AS obs_end_us FROM ev),
        |signup AS (SELECT user_id, MIN(ts_us) AS t0_us FROM ev WHERE event_type = 'signup' GROUP BY 1),
        |dur AS (
        | SELECT s.user_id,
        |  CASE WHEN MIN(CASE WHEN p.ts_us > s.t0_us THEN p.ts_us END) IS NOT NULL
        |   THEN (MIN(CASE WHEN p.ts_us > s.t0_us THEN p.ts_us END) - s.t0_us) // 86400000000
        |   ELSE (mx.obs_end_us - s.t0_us) // 86400000000 END AS t_days,
        |  MIN(CASE WHEN p.ts_us > s.t0_us THEN p.ts_us END) IS NOT NULL AS observed
        | FROM signup s CROSS JOIN mx
        |  LEFT JOIN (SELECT user_id, ts_us FROM ev WHERE event_type = 'purchase') p USING (user_id)
        | GROUP BY s.user_id, s.t0_us, mx.obs_end_us),
        |grid AS (
        | SELECT CAST(t_days AS BIGINT) AS t_days,
        |  CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS n_events,
        |  CAST(SUM(CASE WHEN observed THEN 0 ELSE 1 END) AS BIGINT) AS n_censored
        | FROM dur GROUP BY 1),
        |km AS (
        | SELECT *, CAST(SUM(n_events + n_censored) OVER (ORDER BY t_days ASC
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        | FROM grid),
        |pts AS (SELECT *, ROW_NUMBER() OVER (ORDER BY t_days ASC) AS i FROM km WHERE n_events > 0),
        |rec AS (
        | SELECT i, t_days, n_events, n_censored, n_risk,
        |  CAST(CAST(1 AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS DECIMAL(28,12)) AS s
        | FROM pts WHERE i = 1
        | UNION ALL
        | SELECT p.i, p.t_days, p.n_events, p.n_censored, p.n_risk,
        |  CAST(CAST(r.s AS DOUBLE) * (CAST(1 AS DOUBLE) - CAST(p.n_events AS DOUBLE) / CAST(p.n_risk AS DOUBLE)) AS DECIMAL(28,12))
        | FROM pts p JOIN rec r ON p.i = r.i + 1)
        |SELECT t_days, n_events, n_censored, n_risk,
        | CAST(n_events AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
        | CAST(s AS DOUBLE) AS survival
        |FROM rec""".stripMargin,
    "e_markov" ->
      """WITH base AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |pairs AS (
        | SELECT event_type AS from_type,
        |  LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
        | FROM base),
        |cnt AS (
        | SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        | FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM cnt GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        | CAST(c.n AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS p
        |FROM cnt c JOIN tot t USING (from_type)""".stripMargin,
    "e_multitouch" ->
      s"""WITH base AS (
         | SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |t AS (
         | SELECT *, SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER (
         |   PARTITION BY user_id ORDER BY ts_us
         |   RANGE BETWEEN $FUNNEL_WINDOW_US PRECEDING AND CURRENT ROW) AS n_touch
         | FROM base)
         |SELECT user_id, event_id AS purchase_id, ts_us,
         | CAST(n_touch AS BIGINT) AS n_touch,
         | CASE WHEN n_touch > 0 THEN 1.0 / CAST(n_touch AS DOUBLE) END AS credit_per_click
         |FROM t WHERE event_type = 'purchase'""".stripMargin,
    "e_window_uniques" -> windowUniquesSql,
    "e_stream_uniques" -> windowUniquesSql,
    // the chained pipeline promises EQUALITY with the batch
    // per-window distinct-user counts
    "e_stream_chain" ->
      s"""SELECT
         | strftime(make_timestamp(CAST(floor(epoch(ts) / $WINDOW_SEC) * $WINDOW_SEC AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
         | event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM events GROUP BY 1, 2""".stripMargin,
    // complete-mode totals promise EQUALITY with the batch GROUP BY
    "e_stream_totals" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id""".stripMargin,
    // the streaming IVM twin promises merge ≡ the batch full
    // recompute (C34's law on the replay harness)
    "e_stream_incr" ->
      """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
        | CAST(COUNT(*) AS BIGINT) AS n_events,
        | CAST(MIN(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS min_value,
        | CAST(MAX(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS max_value,
        | CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    // the ingest round-trip promises the sink EQUALS the source table
    "e_stream_ingest" ->
      """SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
        | CAST(ROUND(CAST(value AS DECIMAL(18,2)), 2) AS DOUBLE) AS value
        |FROM events""".stripMargin,
    // the MG guarantees are TRUE by construction whatever the merge
    // order; the exact window totals anchor the row set cross-engine
    "e_stream_hh" ->
      s"""SELECT
         | strftime(make_timestamp(CAST(floor(epoch(ts) / $WINDOW_SEC) * $WINDOW_SEC AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
         | CAST(COUNT(*) AS BIGINT) AS n_events,
         | TRUE AS sandwich_ok, TRUE AS coverage_ok
         |FROM events GROUP BY 1""".stripMargin,
    // streaming dedup promises EQUALITY with the batch DISTINCT over
    // the activity key (see the query's exactness argument)
    "e_stream_dedup" ->
      s"""SELECT DISTINCT
         | strftime(make_timestamp(CAST(floor(epoch(ts) / $WINDOW_SEC) * $WINDOW_SEC AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
         | event_type, user_id
         |FROM events""".stripMargin,
    "e_abtest" ->
      """WITH u AS (
        | SELECT user_id,
        |  MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |  (user_id % 2 + 2) % 2 AS arm
        | FROM events GROUP BY user_id),
        |m AS (
        | SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(conv) AS BIGINT) AS k
        | FROM u GROUP BY arm),
        |r AS (
        | SELECT
        |  CAST(SUM(CASE WHEN arm = 0 THEN n END) AS BIGINT) AS n_a,
        |  CAST(SUM(CASE WHEN arm = 0 THEN k END) AS BIGINT) AS k_a,
        |  CAST(SUM(CASE WHEN arm = 1 THEN n END) AS BIGINT) AS n_b,
        |  CAST(SUM(CASE WHEN arm = 1 THEN k END) AS BIGINT) AS k_b
        | FROM m),
        |se AS (
        | SELECT *,
        |  (CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |   (CAST(1.0 AS DOUBLE) - CAST(k_a + k_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)) *
        |   (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE)) AS se2
        | FROM r)
        |SELECT n_a, k_a, n_b, k_b,
        | CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
        | CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
        | CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS lift,
        | CASE WHEN se2 > 0.0 THEN
        |  (CAST(k_b AS DOUBLE) / CAST(n_b AS DOUBLE) - CAST(k_a AS DOUBLE) / CAST(n_a AS DOUBLE)) / sqrt(se2)
        | ELSE NULL END AS z
        |FROM se""".stripMargin,
    "e_twa" ->
      """WITH base AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        | FROM events),
        |seq AS (
        | SELECT user_id, cents,
        |  lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) - ts_us AS dur_us
        | FROM base),
        |m AS (
        | SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(dur_us) AS BIGINT) AS total_us,
        |  SUM(CAST(cents AS HUGEINT) * CAST(dur_us AS HUGEINT)) AS num
        | FROM seq WHERE dur_us IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_intervals,
        | CAST(num AS DOUBLE) / (100.0 * CAST(total_us AS DOUBLE)) AS twa
        |FROM m""".stripMargin,
    "e_fill" ->
      """WITH bounds AS (
        | SELECT CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
        |  CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1 FROM events),
        |days AS (
        | SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        | FROM bounds),
        |users AS (SELECT DISTINCT user_id FROM events),
        |daily AS (
        | SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_tx,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS rev
        | FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |grid AS (
        | SELECT g.user_id, g.day, dl.n_tx, dl.rev,
        |  last_value(dl.rev IGNORE NULLS)
        |   OVER (PARTITION BY g.user_id ORDER BY g.day ASC) AS revenue
        | FROM (SELECT u.user_id, d.day FROM users u CROSS JOIN days d) g
        | LEFT JOIN daily dl ON g.user_id = dl.user_id AND g.day = dl.day)
        |SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
        | COALESCE(n_tx, CAST(0 AS BIGINT)) AS n_tx, revenue,
        | (rev IS NULL AND revenue IS NOT NULL) AS is_filled
        |FROM grid""".stripMargin,
    "e_gaps" ->
      """WITH base AS (
        | SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |g AS (
        | SELECT user_id, ts_us - lag(ts_us) OVER (
        |   PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC) AS gap_us
        | FROM base)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        | MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
        | CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
        | CAST(SUM(gap_us) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_gap_us
        |FROM g WHERE gap_us IS NOT NULL GROUP BY user_id""".stripMargin,
    "e_paths" ->
      """WITH base AS (
        | SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |tri AS (
        | SELECT event_type || '>' ||
        |  lead(event_type, 1) OVER w || '>' ||
        |  lead(event_type, 2) OVER w AS path,
        |  lead(event_type, 2) OVER w AS t3
        | FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC))
        |SELECT rank, path, n FROM (
        | SELECT path, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path ASC) AS BIGINT) AS rank
        | FROM tri WHERE t3 IS NOT NULL GROUP BY path) t
        |WHERE rank <= 10""".stripMargin,
    "e_stickiness" ->
      """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1),
        |wx AS (SELECT DISTINCT day + CAST(t.i AS INTEGER) AS day, user_id
        |       FROM ud, UNNEST(range(0, 7)) t(i)),
        |wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM wx GROUP BY 1)
        |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
        | CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE) AS stickiness
        |FROM dau d JOIN wau w ON w.day = d.day""".stripMargin,
    "e_anomaly" ->
      """WITH days AS (
        | SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med FROM days GROUP BY 1),
        |dev AS (SELECT d.event_type, quantile_cont(abs(d.n - m.med), 0.5) AS mad
        |        FROM days d JOIN med m USING (event_type) GROUP BY 1)
        |SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.n, m.med, v.mad,
        | CASE WHEN v.mad > 0.0 THEN round((d.n - m.med) / (1.4826 * v.mad), 6) END AS robust_z,
        | v.mad > 0.0 AND abs(CASE WHEN v.mad > 0.0 THEN round((d.n - m.med) / (1.4826 * v.mad), 6) END) > 3.0 AS anomaly
        |FROM days d JOIN med m USING (event_type) JOIN dev v USING (event_type)""".stripMargin,
    "e_spike" ->
      """WITH hours AS (
        | SELECT event_type, date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |typ AS (
        | SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
        |  CAST(COUNT(*) AS BIGINT) AS n_buckets
        | FROM hours GROUP BY 1)
        |SELECT h.event_type, strftime(h.h, '%Y-%m-%d %H:%M:%S') AS hour, h.n,
        | h.n * t.n_buckets > t.total * 2 AS spike
        |FROM hours h JOIN typ t ON t.event_type = h.event_type""".stripMargin,
    "e_window" -> windowSql,
    "e_stream_window" -> windowSql,
    // the streaming CDC state must hash-match the batch q_cdc twin
    "e_stream_cdc" -> graft.relational.RelationalPack.oracles("q_cdc"),
    "e_stream_enrich" ->
      s"""SELECT
         | strftime(make_timestamp(CAST(floor(epoch(e.ts) / $WINDOW_SEC) * $WINDOW_SEC AS BIGINT) * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
         | c.c_mktsegment AS mktsegment, CAST(COUNT(*) AS BIGINT) AS n_events,
         | CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
         |FROM events e JOIN customer c ON e.user_id = c.c_custkey
         |GROUP BY 1, 2""".stripMargin,
    "e_sessions" -> sessionsSql,
    "e_stream_sessions" -> sessionsSql,
    "e_funnel" ->
      s"""WITH base AS (
         | SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
         |marked AS (
         | SELECT *, MAX(CASE WHEN event_type = 'click' THEN ts_us END) OVER (
         |   PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
         |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_us
         | FROM base)
         |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         | CAST(SUM(CASE WHEN last_click_us IS NOT NULL AND ts_us - last_click_us <= $FUNNEL_WINDOW_US THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed
         |FROM marked WHERE event_type = 'purchase' GROUP BY user_id""".stripMargin,
    "e_retention" ->
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |cohorts AS (SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY 1)
        |SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
        | CAST(d.day - c.cohort_day AS BIGINT) AS day_offset,
        | CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        |FROM days d JOIN cohorts c USING (user_id)
        |GROUP BY c.cohort_day, d.day - c.cohort_day""".stripMargin,
    "e_pivot" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val cols = types.flatMap(t => Seq(
        s"CAST(COUNT(*) FILTER (event_type = '$t') AS BIGINT) AS ${t}_n",
        s"CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))) FILTER (event_type = '$t'), 2) AS DOUBLE) AS ${t}_sum_value"))
        .mkString(",\n ")
      s"""SELECT user_id,
         | $cols
         |FROM events GROUP BY user_id""".stripMargin
    },
    "e_topk" ->
      """SELECT rank, user_id, total_value, n_events FROM (
        | SELECT user_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY SUM(CAST(value AS DECIMAL(18,2))) DESC, user_id ASC) AS BIGINT) AS rank,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        | FROM events GROUP BY user_id) t
        |WHERE rank <= 20""".stripMargin,
  )
}
