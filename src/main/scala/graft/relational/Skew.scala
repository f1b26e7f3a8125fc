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
  * The salt assignment is content-hash based (pmod of hash over the
  * skewed side's columns), so plans stay deterministic and re-runs
  * partition identically — no RNG, per the engine's reproducibility
  * contract.
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
    val saltCol = pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(salt))
    val bigS = big.withColumn("__salt", saltCol)
    val compactS = compact.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(compactS, keys :+ "__salt")
      .drop("__salt")
      // restore plain-join column order: keys first (join output), then
      // big's non-key columns, then compact's non-key columns — same
      // as big.join(compact, keys)
      .select((keys ++ big.columns.filterNot(keys.contains)
        ++ compact.columns.filterNot(keys.contains)).map(col).toIndexedSeq: _*)
  }

  /** Two-phase aggregation over a skewed group key for
    * NON-partial-aggregable aggregates (exact distinct counts):
    * phase 1 dedups (keys, x) on a salted shuffle, phase 2 counts per
    * key. Plain `countDistinct` ships every value of a hot key to one
    * reducer; here the dedup happens across `salt`-spread partitions
    * first and the final count receives pre-shrunk data.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                          outCol: String, salt: Int = 64): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.select((keys :+ valueCol).map(col).toIndexedSeq: _*)
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(salt)))
      .groupBy((keys :+ "__salt").map(col).toIndexedSeq: _*)
      .agg(collect_set(col(valueCol)).as("__vs"))
      // values are hash-partitioned by __salt, so the same value never
      // appears under two salts of one key: set sizes just add up.
      .groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(sum(size(col("__vs"))).as(outCol))
  }

  /** Convenience: the salt expression used for the big side — exposed
    * so callers can pre-materialize it when reusing a salted layout
    * across several joins. */
  def saltExpr(df: DataFrame, salt: Int): Column =
    pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salt))
}
