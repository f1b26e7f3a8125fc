package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, TestMetrics}

/** Measured proof that salting actually BALANCES a hot-key join —
  * the third leg of the byte-level evidence set (ShuffleVolumeSpec:
  * bounded totals; ZOrderLayoutSpec: pruned reads; here: flattened
  * per-task maxima). The scenario AQE cannot rescue at test scale
  * (its skew split triggers at 256 MB partitions) and broadcast is
  * forbidden from (one hot key = 400k rows, 100 cold keys, compact
  * 101-row dim, autoBroadcastJoinThreshold=-1): the plain sort-merge
  * join funnels every hot row through ONE reducer, so the max
  * per-task shuffle-read bytes ≈ the whole hot key; Skew.saltedJoin
  * spreads it over `salt` sub-keys. Asserts the salted max is under
  * HALF the plain max (in practice far less: 64 salts over 64
  * reducers leave a few sub-keys per task), on identical output. */
class SkewBalanceSpec extends SparkSpec {

  private def maxShuffleRead(action: => Unit): Long =
    TestMetrics.taskMetricMax(spark)(_.shuffleReadMetrics.totalBytesRead)(action)

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  test("saltedJoin flattens the hot reducer (max per-task shuffle-read bytes)") {
    import spark.implicits._
    val big = spark.range(400000).select(lit(42L).as("k"), $"id".as("payload"))
      .union(spark.range(10000).select(($"id" % 100 + 100).as("k"), $"id".as("payload")))
      .repartition(4).localCheckpoint(true)
    val compact = spark.range(200).select($"id".as("k"), ($"id" * 7).as("attr"))
      .localCheckpoint(true)

    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val priorCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    val priorShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // 64 reducers so the 64 sub-keys' hash placement converges (the
    // suite default of 4 leaves binomially lumpy shares); the plain
    // join's hot key still lands on ONE of them whatever the count
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    // at toy scale AQE coalesces every post-shuffle partition under
    // its 64 MB advisory size into ONE reader, collapsing plain and
    // salted alike to a single task and hiding the balance signal; at
    // 100 TB partitions exceed the advisory size, so disabling
    // coalescing here is what makes the toy measurement isomorphic
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val plain = big.join(compact, Seq("k"))
      val salted = Skew.saltedJoin(big, compact, Seq("k"), salt = 64)

      // identical output first (salt chooses WHERE, never WHAT)
      def sig(df: DataFrame): (Long, Long, Long) = {
        val r = df.agg(count(lit(1)), sum($"payload"), sum($"attr")).collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val sigPlain = sig(plain)
      assert(sig(salted) === sigPlain, "salting changed the join result")
      assert(sigPlain._1 === 410000L, "unexpected join cardinality")

      val maxPlain = maxShuffleRead(materialize(plain))
      val maxSalted = maxShuffleRead(materialize(salted))
      assert(maxPlain > 0 && maxSalted > 0,
        s"vacuous: no shuffle read measured ($maxPlain, $maxSalted)")
      assert(maxSalted * 2 < maxPlain,
        s"salted hot-reducer max $maxSalted B is not under half the plain max $maxPlain B " +
          "— the salt scatter is not spreading the hot key")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", priorCoalesce)
      spark.conf.set("spark.sql.shuffle.partitions", priorShuffle)
    }
  }
}
