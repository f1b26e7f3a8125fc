package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins — the fallback when AQE's
  * skew-join splitting can't help.
  *
  * AQE (enabled engine-wide, see [[graft.GraftSession]]) splits
  * oversized shuffle partitions at runtime, which handles *moderate*
  * key skew for sort-merge joins transparently. What it cannot fix is
  * a single hot key whose probe-side rows must still meet every
  * matching build row: all of them hash to one reducer. Salting
  * breaks that key apart: the skewed side scatters each row into one
  * of `salt` sub-keys, the compact side is replicated `salt` times,
  * and the join key becomes (key, salt) — the hot key's work spreads
  * over `salt` tasks at the cost of replicating the compact side
  * (bounded: `salt × |compact|` rows).
  *
  * The salt assignment spreads each row by a hash of its content
  * plus its row position (so duplicate rows of a hot key still fan
  * out instead of collapsing onto one salt). The salt only chooses
  * WHERE a row is processed — the join RESULT is identical for any
  * salt assignment, so reproducibility of results is unaffected.
  */
object Skew {

  /** Inner equi-join of a skewed `big` side against a `compact` side
    * on `keys`, salted `salt` ways. Result equals
    * `big.join(compact, keys)` exactly (verified by spec); column
    * order is big's columns then compact's non-key columns.
    *
    * Use when one/few join keys dominate the distribution (power-law
    * user ids, null-ish defaults) and the compact side is small
    * enough to replicate but too large (or too skew-matched) to
    * broadcast outright.
    */
  def saltedJoin(big: DataFrame, compact: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    // honor a pre-materialized __salt (saltExpr workflow) — but
    // NORMALIZED into this join's modulus: a column materialized with
    // a different salt count (or by unrelated code) would otherwise
    // silently drop every big row whose __salt >= salt, since no
    // compact replica carries that value
    val bigS = (if (big.columns.contains("__salt"))
                  big.withColumn("__salt", pmod(col("__salt"), lit(salt)))
                else big.withColumn("__salt", saltExpr(big, salt))).alias("__big")
    val compactS = compact.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1)))).alias("__cmp")
    val cond = (keys :+ "__salt")
      .map(k => col(s"__big.$k") === col(s"__cmp.$k")).reduce(_ && _)
    // restore plain-join column order: keys first (join output), then
    // big's non-key columns, then compact's non-key columns — same as
    // big.join(compact, keys). Side-qualified selects keep shared
    // non-key column names unambiguous (plain join allows them too).
    val out = keys.map(k => col(s"__big.$k").as(k)) ++
      big.columns.filterNot(keys.contains).map(c => col(s"__big.$c").as(c)) ++
      compact.columns.filterNot(keys.contains).map(c => col(s"__cmp.$c").as(c))
    bigS.join(compactS, cond).select(out.toIndexedSeq: _*)
  }

  /** Two-phase aggregation over a skewed group key for
    * NON-partial-aggregable aggregates (exact distinct counts):
    * phase 1 dedups (keys, x) rows on a shuffle keyed by the FULL
    * tuple — a hot key's values spread across partitions by value
    * hash (the spreading an explicit salt column would add is already
    * inside hash(keys, value)) — and phase 2 counts per key, fully
    * partial-aggregable. Plain `countDistinct` ships every value of a
    * hot key to one reducer; and the previous formulation here
    * collect_set-ed each (key, salt-shard)'s values into ONE
    * aggregation buffer — bounded only by |distinct|/salt, the
    * unbounded-buffer class this engine bans everywhere else. Both
    * phases now carry constant per-row state.
    *
    * `salt` is retained for source compatibility; the full-tuple
    * shuffle already spreads at the session's partition count, which
    * upper-bounds what any salt value could achieve. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                          outCol: String, salt: Int = 64): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.select((keys :+ valueCol).map(col).toIndexedSeq: _*)
      .distinct()
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(count(col(valueCol)).as(outCol))
  }

  /** The salt expression for the big side — exposed so callers can
    * pre-materialize it (as a column named `__salt`) when reusing a
    * salted layout across several joins; [[saltedJoin]] detects and
    * reuses it (normalized by pmod into the join's modulus).
    *
    * The salt is a pure CONTENT hash, so a row's shuffle destination
    * is a function of its values alone — stable under partial
    * map-stage retries after executor loss (a positional term like
    * monotonically_increasing_id would re-deal rows to different
    * reduce partitions on recompute, the SPARK-23207 round-robin
    * failure class, losing or duplicating join rows). The trade-off:
    * byte-identical duplicate rows of a hot key collapse onto one
    * salt, so salting balances DISTINCT row content; a pathological
    * input of one row repeated a billion times stays on one task —
    * callers facing that shape should add a disambiguating column
    * upstream. The salt choice only affects placement, never results. */
  def saltExpr(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salt))
}
