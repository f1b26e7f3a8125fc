package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: the versioned-store diff key (A36). */
class RoundSevenOpsSpec extends SparkSpec {

  test("g_store_diff: diff steps replay the set algebra of the snapshot lifecycle") {
    import spark.implicits._
    // independent expected sets, straight from the part table (no
    // GraphStore involvement): e1 = band [1,30], merged = e1 ∪ band
    // [20,45] (upsert on a src/dst-only schema is a set union),
    // e3 = band [10,50] (reset-write)
    def band(lo: Int, hi: Int): Set[(Long, Long)] = {
      val p = Tables.part(spark, sfDir)
        .select($"p_partkey".cast("long").as("k"), $"p_brand", $"p_size")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .filter(t => t._3 >= lo && t._3 <= hi)
      val bySize = p.toSeq.groupBy(t => (t._2, t._3))
      val up = for {
        (key, as) <- bySize.toSeq
        bs <- bySize.get((key._1, key._2 + 1)).toSeq
        a <- as; b <- bs
      } yield (a._1, b._1)
      (up ++ up.map(_.swap)).toSet
    }
    val e1 = band(1, 30)
    val merged = e1 ++ band(20, 45)
    val e3 = band(10, 50)
    val rows = SparkEntry.queries("g_store_diff")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getString(3)))
    val step1 = rows.filter(_._1 == 1L)
    val step2 = rows.filter(_._1 == 2L)
    assert(step1.map(_._2).toSet === (merged -- e1), "step-1 added set")
    assert(step1.forall(_._3 == "added"), "an upsert can only add")
    assert(step2.filter(_._3 == "added").map(_._2).toSet === (e3 -- merged))
    assert(step2.filter(_._3 == "removed").map(_._2).toSet === (merged -- e3))
    assert(step2.exists(_._3 == "removed"), "reset must drop edges (non-vacuous)")
    assert(rows.length === step1.length + step2.length)
  }
}
