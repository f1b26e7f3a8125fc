package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal independent set via Luby's algorithm (SURVEY §2 A28) —
  * THE textbook parallel-graph symmetry breaker (Luby 1986), and the
  * scheduling/conflict-resolution primitive (pick a maximal
  * non-conflicting subset: ad slots, co-scheduled jobs, seed docs no
  * two of which are near-dups when run over a dup graph).
  *
  * Deterministic variant: round r's priority for node v is
  * md5(r + "_" + v) — behaves like Luby's fresh random draw per
  * round (so the O(log n) expected-rounds argument applies; measured
  * 3 rounds at sf0.01, 4 at sf0.1) but is a pure function of (round,
  * node), so the oracle replays every round bit-for-bit and the
  * result is schedule-independent. A node joins the MIS when its
  * priority is strictly below every UNDECIDED neighbor's (md5
  * collisions on distinct inputs being vanishingly rare, strictness
  * cannot deadlock); winners and their neighbors leave the game and
  * the edge set prunes to both-ends-undecided.
  *
  * Scale shape per round: one partial-aggregable min-hash groupBy
  * over the live edge set, one anti-join removal, two semi-join edge
  * prunes — co-partitioned equi-joins only, localCheckpointed so
  * lineage stays one round deep; the convergence probe rides the
  * checkpoint's count. Non-convergence throws (KCore's contract).
  */
object Mis {

  /** `vertices(id)`, `edges(src, dst)` bidirectional; returns every
    * vertex with its membership flag and joining round (null for
    * non-members). */
  def run(s: SparkSession, vertices: DataFrame, edges: DataFrame,
          maxIter: Int = 25): DataFrame = {
    import s.implicits._
    val verts = vertices.select(col("id").cast("long").as("node")).distinct()
      .localCheckpoint(false)
    var u = verts.localCheckpoint()
    var e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter($"src" =!= $"dst")
      .distinct()
      .localCheckpoint()
    var nU = u.count()
    var members = Seq.empty[DataFrame]
    var iter = 0
    while (nU > 0L && iter < maxIter) {
      iter += 1
      val r = iter
      // min undecided-neighbor priority; e is already pruned to
      // both-ends-undecided, so no membership join is needed here
      val minNbr = e
        .select($"src", md5(concat(lit(s"${r}_"), $"dst".cast("string"))).as("h"))
        .groupBy($"src").agg(min($"h").as("mh"))
      val winners = u.join(minNbr.select($"src".as("node"), $"mh"), Seq("node"), "left")
        .filter(md5(concat(lit(s"${r}_"), $"node".cast("string"))) <
          coalesce($"mh", lit("g"))) // 'g' sorts above every hex digest
        .select($"node")
        .localCheckpoint()
      members = members :+ winners.withColumn("mis_round", lit(r.toLong))
      val removed = winners
        .union(e.join(winners.select($"node".as("src")), Seq("src"), "left_semi")
          .select($"dst".as("node")))
        .distinct()
      u = u.join(removed, Seq("node"), "left_anti").localCheckpoint()
      nU = u.count()
      e = e.join(u.select($"node".as("src")), Seq("src"), "left_semi")
        .join(u.select($"node".as("dst")), Seq("dst"), "left_semi")
        .select($"src", $"dst")
        .localCheckpoint()
    }
    if (nU > 0L) throw new IllegalStateException(
      s"Luby MIS did not converge within $maxIter rounds ($nU nodes undecided)")
    val mis = members.reduceOption(_ union _)
      .getOrElse(verts.limit(0).withColumn("mis_round", lit(0L)))
    verts.join(mis, Seq("node"), "left")
      .select($"node", $"mis_round".isNotNull.as("in_mis"), $"mis_round")
  }
}
