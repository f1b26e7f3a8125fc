package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the C16 grouping-sets and H10 robust-anomaly
  * operators. Exact cross-engine values are covered by their DuckDB
  * oracles; these pin the semantic shape a refactor could break. */
class RobustOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q_grouping_sets: requested sets only — no grand total, marginals exact") {
    val out = graft.relational.RelationalPack
      .queries("q_grouping_sets")(spark, sfDir).cache()
    val li = Tables.lineitem(spark, sfDir)
    val nPairs = li.select("l_returnflag", "l_linestatus").distinct().count()
    val nFlags = li.select("l_returnflag").distinct().count()
    val nStats = li.select("l_linestatus").distinct().count()
    // exactly the three requested sets, and NOT cube's fourth (grand total)
    assert(out.count() === nPairs + nFlags + nStats)
    assert(out.filter($"l_returnflag".isNull && $"l_linestatus".isNull).count() === 0)
    // the flag marginal equals a direct groupBy on the same leaf cast
    val direct = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val marginal = out.filter($"l_linestatus".isNull && $"l_returnflag".isNotNull)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(marginal === direct)
    out.unpersist()
  }

  test("e_anomaly: one row per (type, day); z defined iff mad>0; flag implies |z|>3") {
    val out = graft.streaming.EventsPack.queries("e_anomaly")(spark, sfDir).cache()
    val days = Tables.events(spark, sfDir)
      .select($"event_type", to_date($"ts").as("day")).distinct().count()
    assert(out.count() === days)
    assert(out.filter($"mad" > 0.0 && $"robust_z".isNull).count() === 0)
    assert(out.filter(($"mad" === 0.0 || $"mad".isNull) && $"robust_z".isNotNull).count() === 0)
    assert(out.filter($"anomaly" && !(abs($"robust_z") > 3.0)).count() === 0)
    // med/mad are per-type constants
    val perType = out.groupBy($"event_type")
      .agg(countDistinct($"med").as("nm"), countDistinct($"mad").as("nd"))
    assert(perType.filter($"nm" =!= 1 || $"nd" =!= 1).count() === 0)
    // the median really is robust: at least half of each type's days
    // sit at or below it, and at least half at or above
    val split = out.groupBy($"event_type").agg(
      count(lit(1)).as("n"),
      sum(when($"n" <= $"med", 1L).otherwise(0L)).as("lo"),
      sum(when($"n" >= $"med", 1L).otherwise(0L)).as("hi"))
    assert(split.filter($"lo" * 2 < $"n" || $"hi" * 2 < $"n").count() === 0)
    out.unpersist()
  }
}
