package graft.relational

import graft.SparkSpec

import scala.util.Random

/** Salted join / salted distinct-count must be RESULT-IDENTICAL to
  * their plain formulations — skew handling is a physical rewrite,
  * never a semantic one. Data is seeded power-law skew: one key holds
  * ~80% of rows. */
class SkewSpec extends SparkSpec {

  private def skewedData(n: Int, seed: Int): Seq[(Long, Long)] = {
    val rng = new Random(seed)
    (1 to n).map { i =>
      val key = if (rng.nextInt(10) < 8) 1L else 1L + rng.nextInt(50)
      (key, rng.nextInt(100).toLong)
    }
  }

  test("saltedJoin equals the plain join under heavy skew (multiset)") {
    import spark.implicits._
    val big = skewedData(2000, 7).toDF("k", "v")
    val compact = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(compact, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val salted = Skew.saltedJoin(big, compact, Seq("k"), salt = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(salted.sorted === plain.sorted)
    assert(plain.nonEmpty)
  }

  test("saltedJoin with composite keys and salt = 1 degenerates to plain join") {
    import spark.implicits._
    val big = skewedData(500, 8).map { case (k, v) => (k, k % 3, v) }.toDF("k1", "k2", "v")
    val compact = (for (k1 <- 1L to 50L; k2 <- 0L to 2L) yield (k1, k2, k1 * 10 + k2))
      .toDF("k1", "k2", "w")
    val plain = big.join(compact, Seq("k1", "k2")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val salted = Skew.saltedJoin(big, compact, Seq("k1", "k2"), salt = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(salted.sorted === plain.sorted)
  }

  test("saltedCountDistinct equals countDistinct under heavy skew") {
    import spark.implicits._
    val df = skewedData(3000, 9).toDF("k", "v")
    val plain = df.groupBy("k").agg(
        org.apache.spark.sql.functions.countDistinct("v").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(df, Seq("k"), "v", "n", salt = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("saltedJoin handles shared non-key column names like the plain join") {
    import spark.implicits._
    val big = Seq((1L, 10L), (1L, 20L), (2L, 30L)).toDF("k", "v")
    val compact = Seq((1L, 100L), (2L, 200L)).toDF("k", "v") // same non-key name
    val plain = big.join(compact, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val salted = Skew.saltedJoin(big, compact, Seq("k"), salt = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(salted.sorted === plain.sorted)
  }

  test("saltedJoin honors a pre-materialized __salt column (saltExpr workflow)") {
    import spark.implicits._
    val big0 = skewedData(500, 9).toDF("k", "v")
    val big = big0.withColumn("__salt", Skew.saltExpr(big0, 8))
    val compact = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(compact, Seq("k")).drop("__salt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val salted = Skew.saltedJoin(big, compact, Seq("k"), salt = 8).drop("__salt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(salted.sorted === plain.sorted)
  }

  test("saltExpr is a pure content hash: stable across partitionings (retry-safe)") {
    import spark.implicits._
    // a row's salt must be a function of its values alone — a
    // positional term would re-deal rows to different reduce
    // partitions when a lost map task recomputes (SPARK-23207 class)
    val rows = skewedData(300, 7).toDF("k", "v")
    val a = rows.withColumn("__salt", Skew.saltExpr(rows, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val rp = rows.repartition(13)
    val b = rp.withColumn("__salt", Skew.saltExpr(rp, 8))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(a === b)
    // distinct hot-key rows still fan out over several salts
    assert(a.filter(_._1._1 == 1L).values.toSet.size > 1)
  }

  test("saltedJoin normalizes a __salt materialized with a DIFFERENT modulus (no row loss)") {
    import spark.implicits._
    val big0 = skewedData(500, 9).toDF("k", "v")
    // materialized 8 ways, joined 4 ways: rows with __salt >= 4 used
    // to silently vanish from the inner join
    val big = big0.withColumn("__salt", Skew.saltExpr(big0, 8))
    val compact = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big0.join(compact, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val salted = Skew.saltedJoin(big, compact, Seq("k"), salt = 4).drop("__salt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(salted.sorted === plain.sorted)
  }
}
