package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_approx_stats has no SQL oracle (sketch implementations differ
  * per engine), so its accuracy contract lives here: HLL++ distinct
  * counts within 5% of exact, approximate quantiles within the
  * rank-error bound (checked as a value-window around the exact
  * percentile neighborhood). */
class SketchAccuracySpec extends SparkSpec {

  test("approx distinct counts and quantiles stay within tolerance of exact") {
    import spark.implicits._
    // raw sketch accuracy, measured directly (the q_approx_stats query
    // now emits guarantee booleans — asserted below — so the raw
    // values are compared here)
    val joined = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.customer(spark, sfDir), $"o_custkey" === $"c_custkey")
    val both = joined.groupBy($"c_nationkey".cast("long").as("c_nationkey"))
      .agg(approx_count_distinct($"o_custkey", rsd = 0.02).as("an"),
        percentile_approx($"o_totalprice", lit(0.5), lit(10000)).as("ap50"),
        percentile_approx($"o_totalprice", lit(0.95), lit(10000)).as("ap95"),
        countDistinct($"o_custkey").as("n"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.95)").as("p95"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val nation = r.getLong(0)
      val (an, ap50, ap95) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      val (n, p50, p95) = (r.getLong(4), r.getDouble(5), r.getDouble(6))
      // tiny groups (sf0.001 has ~10 customers/nation) need an
      // absolute floor on top of the relative bound
      assert(math.abs(an - n) <= math.max(2.0, 0.05 * n), s"nation $nation distinct: $an vs $n")
      // percentile_approx returns an actual data value near the target
      // rank; exact interpolated percentile bounds it within the
      // group's value spread at the requested accuracy.
      assert(math.abs(ap50 - p50) / p50 <= 0.10, s"nation $nation p50: $ap50 vs $p50")
      assert(math.abs(ap95 - p95) / p95 <= 0.10, s"nation $nation p95: $ap95 vs $p95")
    }
  }

  test("q_approx_stats guarantee booleans all hold") {
    val rows = graft.SparkEntry.queries("q_approx_stats")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4),
        s"nation ${r.getLong(0)}: guarantee violated $r")
    }
  }
}
