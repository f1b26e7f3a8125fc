package graft.graph

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PersistentDataBase-parity facade: wave semantics of query()
  * (source = wave 1, -1 unreachable — main.py:272-305), rule-driven
  * expansion with per-wave persistence (main.py:212-260), and
  * INSERT-OR-IGNORE attribute stability. */
class GraphDBSpec extends SparkSpec {

  private def freshDb(): GraphDB =
    new GraphDB(spark, Files.createTempDirectory("graft-db").resolve("g").toString)

  private def chain(n: Long): DataFrame = {
    import spark.implicits._
    (0L until n).flatMap(i => Seq((i, i + 1), (i + 1, i))).toDF("src", "dst")
  }

  test("query counts waves like the reference: source is wave 1") {
    val db = freshDb()
    db.init(chain(4)) // 0-1-2-3-4 bidirectional
    assert(db.query(0L, 0L) === 1L) // source == target fast path
    assert(db.query(0L, 1L) === 2L)
    assert(db.query(0L, 4L) === 5L)
    assert(db.query(4L, 0L) === 5L) // symmetric
  }

  test("query returns -1 for unreachable and respects maxWaves") {
    import spark.implicits._
    val db = freshDb()
    db.init(chain(3).union(Seq((100L, 101L)).toDF("src", "dst")))
    assert(db.query(0L, 101L) === -1L)
    assert(db.query(0L, 3L, maxWaves = 2) === -1L) // cut off before found
  }

  test("addRelations is INSERT-OR-IGNORE: existing attrs survive") {
    import spark.implicits._
    val db = freshDb()
    db.init(Seq((1L, 2L, "orig")).toDF("src", "dst", "tag"))
    val v = db.addRelations(Seq((1L, 2L, "CLOBBER"), (2L, 3L, "new")).toDF("src", "dst", "tag"))
    assert(v === 2)
    assert(db.edges.as[(Long, Long, String)].collect().toSet ===
      Set((1L, 2L, "orig"), (2L, 3L, "new")))
    assert(db.numberEntries() === 2L)
  }

  test("addExpansion applies the rule wave by wave, depth-bounded") {
    import spark.implicits._
    val db = freshDb()
    db.init(Seq((0L, 1L)).toDF("src", "dst"))
    // rule: n -> n+1 for n < 10 (an "atom deletion" style generator)
    val rule: DataFrame => DataFrame = f =>
      f.filter(col("node") < 10).select(col("node").as("src"), (col("node") + 1).as("dst"))
    db.addExpansion(Seq(1L).toDF("node"), rule, depth = 3)
    // waves: 1->2, 2->3, 3->4; plus the initial 0->1
    assert(db.edges.as[(Long, Long)].collect().toSet ===
      Set((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    // now queryable end to end
    assert(db.query(0L, 4L) === 5L)
  }

  test("addExpansion with MULTIPLE typed rules: edges carry rule identity") {
    import spark.implicits._
    // the reference's multi-generator expansion (bond deletion / atom
    // deletion / substitution, main.py:60-114): each rule tags its
    // edges, expansion runs over the UNION of all rules
    val db = freshDb()
    db.init(Seq((0L, 1L, "seed")).toDF("src", "dst", "rule"))
    val grow: DataFrame => DataFrame = f =>
      f.filter(col("node") < 6).select(col("node").as("src"),
        (col("node") + 1).as("dst"), lit("grow").as("rule"))
    val jump: DataFrame => DataFrame = f =>
      f.filter(col("node") < 6).select(col("node").as("src"),
        (col("node") + 10).as("dst"), lit("jump").as("rule"))
    val both: DataFrame => DataFrame = f => grow(f).union(jump(f))
    db.addExpansion(Seq(1L).toDF("node"), both, depth = 2)
    val edges = db.edges.as[(Long, Long, String)].collect().toSet
    // wave 1 from {1}: grow 1->2, jump 1->11; wave 2 from {2, 11}:
    // grow 2->3, jump 2->12 (11 > 6 generates nothing)
    assert(edges === Set(
      (0L, 1L, "seed"),
      (1L, 2L, "grow"), (1L, 11L, "jump"),
      (2L, 3L, "grow"), (2L, 12L, "jump")))
    // rule identity is queryable per edge type
    assert(db.edges.filter(col("rule") === "jump").count() === 2L)
  }

  test("walks and ktruss run over the persisted snapshot") {
    import spark.implicits._
    val db = freshDb()
    // K4 so the 4-truss is the whole graph; walks can never leave it
    val k4 = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))
    db.init((k4 ++ k4.map(p => (p._2, p._1))).toDF("src", "dst"))
    val tr = db.ktruss(4).collect()
    assert(tr.map(r => (r.getLong(0), r.getLong(1))).toSet === k4.toSet)
    val w = db.walks(Seq(1L).toDF("seed"), steps = 2).collect()
    assert(w.length === 3) // steps 0..2, no dead ends in K4
    assert(w.forall(r => Set(1L, 2L, 3L, 4L)(r.getLong(1))))
  }

  test("stats and degrees reflect the persisted edge table") {
    val db = freshDb()
    db.init(chain(2)) // edges: 4 directed, 3 distinct src nodes
    val st = db.stats().collect().head
    assert(st.getLong(0) === 3L) // n_nodes (0,1,2 all appear as src)
    assert(st.getLong(1) === 4L) // n_edges
    val deg = db.degrees().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(deg === Map(0L -> 1L, 1L -> 2L, 2L -> 1L))
  }

  test("probe-routed front door: facade calls ARE the Dispatch/routed engines") {
    import spark.implicits._
    val db = freshDb()
    db.init(chain(3))
    // class-structured ops over a vertex table (the documented contract)
    val verts = Seq((1L, "B1", 1L), (2L, "B1", 2L), (3L, "B1", 2L), (4L, "B2", 5L))
      .toDF("node", "brand", "size")
    assert(db.misClasses(verts).collect().toSet ===
      Dispatch.mis(spark, verts).collect().toSet)
    assert(db.jaccardClasses(verts).collect().toSet ===
      Dispatch.jaccard(spark, verts).collect().toSet)
    assert(db.hitsClasses(verts, iters = 2).collect().toSet ===
      Dispatch.hits(spark, verts, iters = 2).collect().toSet)
    val parts = verts.select($"node".as("part"), $"brand", $"size".cast("int").as("size"))
    assert(db.dagDepth(parts).collect().toSet ===
      DagDepth.depthOf(spark, parts).collect().toSet)
    assert(db.classBridges(verts.select($"brand", $"size")).collect().toSet ===
      Bridges.classBridgesOf(spark, verts.select($"brand", $"size")).collect().toSet)
    // snapshot-edge ops route on the same probe discipline
    val ap = db.bfsAllPairs().collect()
    assert(ap.count(r => r.getLong(0) === 0L) === 4) // chain(3): 0 reaches all
    val btw = db.betweenness().collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(btw(0L) === 0.0 && btw(3L) === 0.0) // chain endpoints carry nothing
    assert(btw(1L) === btw(2L) && btw(1L) > 0.0)
  }
}
