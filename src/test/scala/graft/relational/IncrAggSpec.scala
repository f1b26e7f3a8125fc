package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q_incr_agg (C34): the incremental-view-maintenance law — merging
  * a MATERIALIZED base state with a delta's partial aggregate must
  * equal the full recompute, for every state column. The DuckDB
  * oracle pins exactly this at the data SFs (its SQL is the full
  * recompute); these specs drive the merge through a stored base
  * state (the production shape: the base is a table, not a plan) and
  * cover the group-algebra edges. */
class IncrAggSpec extends SparkSpec {
  import spark.implicits._

  // the PRODUCTION partial aggregate — the law must be proven for
  // the state shape the key actually maintains, not a spec copy
  private def partAgg(df: DataFrame): DataFrame = RelationalPack.partAgg(df)

  private def rows(df: DataFrame): Set[(String, String, BigDecimal, Long, BigDecimal, BigDecimal)] =
    df.collect().map(r => (r.getString(0), r.getString(1),
      BigDecimal(r.getDecimal(2)), r.getLong(3),
      BigDecimal(r.getDecimal(4)), BigDecimal(r.getDecimal(5)))).toSet

  test("merge of a MATERIALIZED base state with a delta equals the full recompute") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val base = li.filter($"l_orderkey" % 10 =!= 0)
    val delta = li.filter($"l_orderkey" % 10 === 0)
    // materialize the base state to parquet — the maintained-table
    // shape: the merge must work from STORED state, not a live plan
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    partAgg(base).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val merged = RelationalPack.incrMerge(stored, partAgg(delta))
    assert(rows(merged) === rows(partAgg(li)))
  }

  test("group algebra edges: empty delta is the identity; a brand-new group flows through") {
    val mk = (rf: String, ls: String, qty: Double, ok: Long) =>
      (rf, ls, BigDecimal(qty), ok)
    val base = Seq(mk("A", "F", 10.0, 1L), mk("A", "F", 4.0, 11L), mk("R", "O", 7.0, 21L))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey")
    val emptyDelta = base.filter(lit(false))
    val idem = RelationalPack.incrMerge(partAgg(base), partAgg(emptyDelta))
    assert(rows(idem) === rows(partAgg(base)))
    // a delta introducing a group the base has never seen
    val newGroup = Seq(mk("N", "X", 3.0, 30L), mk("A", "F", 1.0, 40L))
      .toDF("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey")
    val merged = RelationalPack.incrMerge(partAgg(base), partAgg(newGroup))
    assert(rows(merged) === rows(partAgg(base.unionByName(newGroup))))
    // and the merged min/max really moved where the delta extended them
    val af = merged.filter($"l_returnflag" === "A").head()
    assert(BigDecimal(af.getDecimal(4)) === BigDecimal(1.0))
    assert(BigDecimal(af.getDecimal(5)) === BigDecimal(10.0))
  }

  test("a group whose quantities are ALL NULL merges to NULL, matching SQL SUM (close-pass review)") {
    val base = Seq(
      (Some(BigDecimal(5.0)), "A", "F", 1L),
      (None: Option[BigDecimal], "Z", "Z", 2L))
      .map { case (q, rf, ls, ok) => (q.orNull, rf, ls, ok) }
      .toDF("l_quantity", "l_returnflag", "l_linestatus", "l_orderkey")
    val delta = Seq((null.asInstanceOf[BigDecimal], "Z", "Z", 3L))
      .toDF("l_quantity", "l_returnflag", "l_linestatus", "l_orderkey")
    val merged = RelationalPack.incrMerge(partAgg(base), partAgg(delta))
    val zz = merged.filter($"l_returnflag" === "Z").head()
    // SUM over zero non-null values is NULL in every SQL engine — a
    // coalesce-to-zero merge would claim 0.00 and diverge from the
    // recompute oracle
    assert(zz.isNullAt(2) && zz.getLong(3) === 2L && zz.isNullAt(4) && zz.isNullAt(5))
    // recompute agreement including the null group
    assert(rowsNullSafe(merged) === rowsNullSafe(partAgg(base.unionByName(delta))))
  }

  test("a NULL group KEY present in both sides merges to one state row (round-15 advice)") {
    // GROUP BY puts null keys in one group, so the merge must match
    // them too — a plain-equality full outer would keep the null-keyed
    // group as TWO state rows and break merge ≡ recompute
    val base = Seq(
      (BigDecimal(5.0), "A", "F", 1L),
      (BigDecimal(2.0), null.asInstanceOf[String], "F", 2L))
      .toDF("l_quantity", "l_returnflag", "l_linestatus", "l_orderkey")
    val delta = Seq((BigDecimal(3.0), null.asInstanceOf[String], "F", 3L))
      .toDF("l_quantity", "l_returnflag", "l_linestatus", "l_orderkey")
    val merged = RelationalPack.incrMerge(partAgg(base), partAgg(delta))
    assert(merged.count() === 2L) // not three — the null group matched itself
    val nullGroup = merged.filter($"l_returnflag".isNull).head()
    assert(BigDecimal(nullGroup.getDecimal(2)) === BigDecimal(5.0)
      && nullGroup.getLong(3) === 2L)
    val recomputed = partAgg(base.unionByName(delta))
      .collect().map(r => (Option(r.getString(0)), r.getString(1),
        BigDecimal(r.getDecimal(2)), r.getLong(3))).toSet
    val got = merged.collect().map(r => (Option(r.getString(0)), r.getString(1),
      BigDecimal(r.getDecimal(2)), r.getLong(3))).toSet
    assert(got === recomputed)
  }

  private def rowsNullSafe(df: DataFrame): Set[(String, String, Option[BigDecimal], Long, Option[BigDecimal], Option[BigDecimal])] =
    df.collect().map(r => (r.getString(0), r.getString(1),
      Option(r.getDecimal(2)).map(BigDecimal(_)), r.getLong(3),
      Option(r.getDecimal(4)).map(BigDecimal(_)),
      Option(r.getDecimal(5)).map(BigDecimal(_)))).toSet
}
