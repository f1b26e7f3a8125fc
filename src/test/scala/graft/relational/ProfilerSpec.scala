package graft.relational

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** C27 table profiling: hand-built table with known nulls/dupes +
  * plan shape (single scan). */
class ProfilerSpec extends SparkSpec {

  test("profile counts nulls, exact distincts, and typed min/max per column") {
    import spark.implicits._
    val t = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "b", 2.5), (2L, "a", null), (2L, null, 10.0),
      (3L, "a", -1.25), (null, "c", 2.5))
      .toDF("id", "tag", "score")
    val out = Profiler.profile(t).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(out("id") === ((5L, 1L, 3L, "1", "3")))
    assert(out("tag") === ((5L, 1L, 3L, "a", "c")))
    // doubles print through DECIMAL(18,2): fixed two-digit scale
    assert(out("score") === ((5L, 1L, 3L, "-1.25", "10.00")))
  }

  test("an all-null column profiles as zero distincts with null extrema") {
    import spark.implicits._
    val t = Seq((1L, null: String), (2L, null: String)).toDF("id", "v")
    val row = Profiler.profile(t).filter(col("col_name") === "v").head()
    assert(row.getLong(2) === 2L) // n_nulls
    assert(row.getLong(3) === 0L) // n_distinct
    assert(row.isNullAt(4) && row.isNullAt(5))
  }

  test("column names containing dots profile correctly (quoted references)") {
    import spark.implicits._
    val t = Seq((1L, "x"), (2L, null: String)).toDF("user.id", "meta.tag")
    val out = Profiler.profile(t).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out("user.id") === ((0L, 2L)))
    assert(out("meta.tag") === ((1L, 1L)))
  }

  test("plan shape: two sequential scans, and NOTHING table-scale is ever sorted") {
    // Round 15: the old single-pass multi-countDistinct aggregate
    // planned as SortAggregate end to end (string min/max buffers
    // disqualify HashAggregate), sorting the (G+1)x-Expanded table.
    // The profile now pays a second scan to keep every table-scale
    // operator hash-based: pass A is a keyless fold (SortAggregate
    // without grouping keys needs no Sort node), pass B dedups
    // map-side through HashAggregate. The properties pinned here are
    // exactly what the optimization bought: bounded scan count and
    // zero Sort operators anywhere in the plan.
    val plan = Profiler.profile(graft.Tables.orders(spark, sfDir))
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans === 2, s"profile is two sequential scans:\n$plan")
    assert(!plan.contains("+- Sort "), s"no Sort operator anywhere:\n$plan")
    assert(plan.contains("HashAggregate"), "the NDV dedup must be hash-based")
  }
}
