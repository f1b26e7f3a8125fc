package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks natively, built scale-first.
  *
  * The reference's event-history queries (ordered scans over an
  * indexed table, main.py:156-178) are point lookups; at warehouse
  * scale the equivalents are the AS-OF join and the range
  * (point-in-interval) join. Neither is a built-in Spark operator, and
  * the naive formulations are scale killers: a non-equi theta join
  * plans as BroadcastNestedLoopJoin (quadratic pairs), and an
  * "equi-join then keep latest" explodes every key's full history
  * before discarding it. Both operators here are O(n log n) single
  * logical passes.
  */
object AsofJoin {

  /** AS-OF join: for each left row, attach the latest right row with
    * the same key and `right.ts <= left.ts` (DuckDB `ASOF JOIN` with
    * `l.ts >= r.ts` semantics).
    *
    * Shape: instead of joining, both sides are unioned into one
    * stream, shuffled ONCE on the key, sorted by (ts, side) within
    * the partition, and the right row's payload is carried forward to
    * every later left row with a running `last(..., ignoreNulls)`
    * window. No join, no pair explosion, no per-key history blowup:
    * cost is one shuffle + one sort however skewed the match ratio
    * is, the same shape a merge-based ASOF implementation uses
    * internally — expressed declaratively so Catalyst keeps pushdown
    * and codegen.
    *
    * Right rows sort BEFORE left rows at equal ts (side 0 < 1), so a
    * right row at exactly left.ts matches, per ASOF `>=`.
    *
    * Determinism: the carried payload is well-defined iff the right
    * side has at most one row per (key, ts) — the same precondition
    * DuckDB's ASOF JOIN needs to be deterministic.
    *
    * @param carryPrefix prefix for the attached right columns, so they
    *                    never collide with left column names.
    * @param inner       drop left rows with no prior right row (ASOF
    *                    inner join); otherwise keep them with nulls.
    */
  def lastPrior(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String,
                carryPrefix: String = "asof_",
                inner: Boolean = true): DataFrame = {
    val carryCols = right.columns.filterNot(_ == key).toSeq
    val lPrep = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"))
    // Join semantics for nulls: a right row with a null key or null
    // timestamp can match nothing (NULL compares false in both the
    // equi and the <= predicate), but the window formulation would
    // happily group null keys together and sort a null ts first —
    // silently carrying payloads no join would produce. Drop them.
    // (A null-key/ts LEFT row is safe without filtering: null-key
    // partitions then hold no right rows, and a null left ts sorts
    // before every surviving right row.)
    val rPrep = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(
        col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
        struct(carryCols.map(col): _*).as("__r"))
    val unioned = lPrep
      .withColumn("__r", lit(null).cast(rPrep.schema("__r").dataType))
      .unionByName(rPrep.withColumn("__l", lit(null).cast(lPrep.schema("__l").dataType)))

    val w = Window.partitionBy(col("__k")).orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(when(col("__side") === 0, col("__r")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val filtered = if (inner) matched.filter(col("__m").isNotNull) else matched
    val out: Seq[Column] =
      left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
        carryCols.map(c => col(s"__m.$c").as(s"$carryPrefix$c"))
    filtered.select(out: _*)
  }
}

object NearestJoin {

  /** NEAREST-event temporal join (SURVEY §2 C32): for each left row,
    * the right timestamp (same key) closest in time in EITHER
    * direction — the sensor-alignment / context-attachment primitive
    * where AS-OF's latest-prior is wrong for events that can precede
    * OR follow (a click just after the purchase beats one hours
    * before). Ties break BACKWARD (the AS-OF convention).
    *
    * Shape: [[AsofJoin.lastPrior]]'s no-join union stream, shuffled
    * ONCE on the key and sorted by (ts, side) — then BOTH directions
    * read off the same sorted pass: the backward candidate is the
    * running `last` of right timestamps (right sorts before left at
    * equal ts, so same-instant matches backward — that is the tie),
    * the forward candidate the `first` right timestamp from the
    * current row on (same-instant right rows sort BEFORE the left
    * row, so forward is strictly-after by construction). No pair
    * explosion, no per-key history blowup, one shuffle + one sort.
    *
    * Determinism: right rows are deduplicated to distinct (key, ts)
    * here — with duplicates the nearest TIMESTAMP is still unique,
    * so no payload-carry ambiguity exists at all.
    *
    * @return left columns + `near_ts` (the nearest right ts),
    *         `gap` (absolute distance, same unit as the inputs) and
    *         `direction` ('back' | 'fwd'). Inner semantics: left
    *         rows whose key has no right row at all are dropped.
    */
  def nearest(left: DataFrame, right: DataFrame, key: String,
              leftTs: String, rightTs: String): DataFrame = {
    // null key/ts on EITHER side is unmatchable: a null-ts left row
    // would otherwise survive the window pass with an arbitrary-
    // direction match (nulls-first ordering) — drop it like the right
    val lPrep = left
      .filter(col(key).isNotNull && col(leftTs).isNotNull)
      .select(
      col(key).as("__k"), col(leftTs).cast("long").as("__ts"), lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"))
    val rPrep = right
      .filter(col(key).isNotNull && col(rightTs).isNotNull)
      .select(col(key).as("__k"), col(rightTs).cast("long").as("__ts"),
        lit(0).as("__side"))
      .distinct()
      .withColumn("__l", lit(null).cast(lPrep.schema("__l").dataType))
    val unioned = lPrep.unionByName(rPrep)
    val ord = Window.partitionBy(col("__k")).orderBy(col("__ts").asc, col("__side").asc)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rightTsCol = when(col("__side") === 0, col("__ts"))
    val matched = unioned
      .withColumn("__b", last(rightTsCol, ignoreNulls = true).over(back))
      .withColumn("__f", first(rightTsCol, ignoreNulls = true).over(fwd))
      .filter(col("__side") === 1)
      .filter(col("__b").isNotNull || col("__f").isNotNull)
      .withColumn("__takeBack",
        col("__f").isNull ||
          (col("__b").isNotNull && col("__ts") - col("__b") <= col("__f") - col("__ts")))
    val out: Seq[Column] =
      left.columns.toSeq.map(c => col(s"__l.$c").as(c)) :+
        when(col("__takeBack"), col("__b")).otherwise(col("__f")).as("near_ts") :+
        when(col("__takeBack"), col("__ts") - col("__b"))
          .otherwise(col("__f") - col("__ts")).as("gap") :+
        when(col("__takeBack"), lit("back")).otherwise(lit("fwd")).as("direction")
    matched.select(out: _*)
  }
}

object RangeJoin {

  /** Point-in-interval COUNT join: for each interval `[lo, hi)` over a
    * bounded integer domain (epoch days, bucket ids), the number of
    * points it contains — including zero.
    *
    * The naive `points JOIN intervals ON lo <= p AND p < hi` is a
    * non-equi join: Spark plans a nested loop, and even a clever range
    * partitioner materializes every (point, interval) containment pair
    * — at 100 TB with week-long windows that is billions of rows of
    * pure intermediate state. This operator never forms pairs:
    *
    *   1. points collapse to per-value counts (map-side combinable),
    *   2. the counts are densified onto the value spine and prefix-
    *      summed, so `cum(v)` = points with value <= v,
    *   3. each interval reads `cum(hi-1) - cum(lo-1)` via two
    *      equi-joins against the spine.
    *
    * Cost: one aggregation over the points + two joins against a
    * DIMENSION-sized table (the spine is the value domain — calendar
    * days, not facts — so AQE broadcasts it). The prefix-sum window
    * runs un-partitioned over that same dimension-sized spine
    * (thousands of rows at any fact scale; the "no partition defined"
    * warning it triggers is about fact-sized inputs, not this).
    *
    * @param points    single LONG column `p`.
    * @param intervals id columns plus LONG `lo` (inclusive) / `hi`
    *                  (exclusive); `hi >= lo`.
    * @return intervals' id columns + `n_points` (long).
    */
  def intervalPointCounts(points: DataFrame, intervals: DataFrame,
                          idCols: Seq[String]): DataFrame = {
    val ids = idCols.map(col)
    val byVal = points.groupBy(col("p").as("v")).agg(count(lit(1)).as("cnt"))
    // Spine bounds must cover every lookup value (lo-1 and hi-1) as
    // well as every point, so the two cum lookups below always hit.
    // Null bounds contain nothing (SQL comparison semantics), so they
    // don't stretch the spine.
    val boundsRow = byVal.select(col("v"))
      .unionByName(intervals.filter(col("lo").isNotNull).select((col("lo") - 1).as("v")))
      .unionByName(intervals.filter(col("hi").isNotNull).select((col("hi") - 1).as("v")))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx")).head()
    if (boundsRow.isNullAt(0)) // no points AND no non-null intervals
      return intervals.select(ids :+ lit(0L).as("n_points"): _*)
    val (mn, mx) = (boundsRow.getLong(0), boundsRow.getLong(1))
    // The spine is the CALLER'S dimension-bound assertion (calendar
    // days, bucket ids). Check it before building — one outlier
    // sentinel value (or epoch micros passed where days were meant)
    // would otherwise densify a multi-billion-row domain.
    require(mx - mn < (1L << 24),
      s"value domain [$mn, $mx] spans ${mx - mn} values — not dimension-bounded; " +
        "bucket the values first (e.g. days, not micros)")
    // spark.range: distributed spine, no single sequence() array.
    val spine = points.sparkSession.range(mn, mx + 1).select(col("id").as("v"))
    val cum = spine.join(byVal, Seq("v"), "left")
      .withColumn("cum", sum(coalesce(col("cnt"), lit(0L))).over(
        Window.orderBy(col("v").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("v"), col("cum"))

    intervals
      .join(cum.select(col("v").as("__hi_v"), col("cum").as("__cum_hi")),
        col("hi") - 1 === col("__hi_v"), "left")
      .join(cum.select(col("v").as("__lo_v"), col("cum").as("__cum_lo")),
        col("lo") - 1 === col("__lo_v"), "left")
      .select(ids :+
        when(col("lo").isNull || col("hi").isNull, lit(0L)) // null bound contains nothing
          .otherwise(coalesce(col("__cum_hi"), lit(0L)) - coalesce(col("__cum_lo"), lit(0L)))
          .as("n_points"): _*)
  }
}
