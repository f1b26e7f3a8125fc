package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components as alternating large-star / small-star
  * DataFrame rounds (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SOCC'14) — converges in O(log n) rounds
  * regardless of graph diameter.
  *
  * Why not Pregel label propagation (GraphX `connectedComponents`):
  * that converges in *diameter* supersteps. The part edit-graph
  * (chains of p_size ± 1, SURVEY §4) has diameter ~50, so Pregel runs
  * ~50 near-empty shuffle stages; a 100 TB graph with long chains is
  * even worse. Star contraction halves path lengths every round —
  * the measured sf0.1 wall time drops ~6× and the round count is
  * data-size-, not diameter-, bound. GraphX's version stays in
  * [[GraphXAlgos]] as the spec cross-check.
  *
  * Output labeling is identical to GraphX's documented contract:
  * component id = min vertex id in the component; vertices absent
  * from `edges` are singleton components.
  *
  * Scale notes (SURVEY §5): every round is two groupBy-min shuffles +
  * two self-joins on the same key — no driver-side state, no
  * collect. Rounds localCheckpoint (non-eager) to truncate lineage,
  * same pattern as [[Bfs]]. Convergence is an exact set-equality
  * check (one-sided `except`), gated by a cheap one-job fingerprint
  * so the except runs only on rounds that can actually be the
  * fixpoint — see [[fingerprint]].
  */
object ConnectedComponents {

  /** Internal edge orientation: (hi, lo) with hi > lo always. */
  private def canonical(edges: DataFrame): DataFrame =
    edges.select(
      greatest(col("src").cast("long"), col("dst").cast("long")).as("hi"),
      least(col("src").cast("long"), col("dst").cast("long")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()

  /** large-star(u): connect every neighbor v > u to
    * m = min(N(u) ∪ {u}). One shuffle: the per-u min rides a window
    * over the symmetric view instead of a groupBy + join-back.
    * Output may contain duplicates — [[smallStar]]'s min-aggregation
    * is duplicate-tolerant and its trailing distinct restores the
    * set, so no extra exchange is spent deduping here. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("hi").as("u"), col("lo").as("v"))
      .unionAll(e.select(col("lo").as("u"), col("hi").as("v")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
    sym.withColumn("m", least(col("u"), min("v").over(w)))
      .filter(col("v") > col("u"))
      .select(col("v").as("hi"), col("m").as("lo"))
  }

  /** small-star(u): connect every neighbor v < u, and u itself, to
    * m = min(N⁻(u) ∪ {u}). With canonical (hi, lo) edges the
    * strictly-smaller neighborhood of u is exactly the `lo` side, so
    * this is one window shuffle on `hi`; the (u, m) self edge is
    * emitted by the group's first row (row_number = 1). */
  private def smallStar(e: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("hi")
    val wo = Window.partitionBy("hi").orderBy("lo")
    e.withColumn("m", min("lo").over(w))
      .withColumn("rn", row_number().over(wo))
      .select(
        when(col("rn") === 1, array(struct(col("lo").as("hi"), col("m").as("lo")),
                                    struct(col("hi"), col("m").as("lo"))))
          .otherwise(array(struct(col("lo").as("hi"), col("m").as("lo"))))
          .as("out"))
      .select(explode(col("out")).as("e"))
      .select(col("e.hi"), col("e.lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
  }

  /** One-job set fingerprint: (row count, XOR of per-row hashes).
    * Order-independent, overflow-free, and valid for SETS (the edge
    * DF is distinct by construction). Equal sets ⇒ equal fingerprint,
    * so it gates the exact `except` check: a fingerprint collision
    * merely wastes one except job, never affects the result. This is
    * also the materializing action for the non-eager checkpoint. */
  private def fingerprint(e: DataFrame): (Long, Long) = {
    val r = e.agg(
      count(lit(1)),
      coalesce(expr("bit_xor(xxhash64(hi, lo))"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** (id, component) for every vertex in `vertices` (col "id");
    * `edges` has (src, dst), either or both orientations.
    *
    * @param localFinishThreshold once the contracted pair set's count
    *        (already known from the fingerprint gate — no extra job)
    *        drops to this many rows, the remaining relation is
    *        collected and closed with union-find on the driver instead
    *        of running further distributed rounds. Star contraction
    *        shrinks the pair set geometrically, so at any fact scale
    *        the loop reaches the threshold after O(log n) rounds —
    *        and the tail rounds it replaces are exactly the ones where
    *        per-round scheduling overhead dwarfs the (tiny) data. The
    *        same adaptive principle as AQE swapping in a broadcast
    *        join when a runtime size drops under a bound. 0 disables.
    */
  def run(s: SparkSession, vertices: DataFrame, edges: DataFrame,
          maxRounds: Int = 50, localFinishThreshold: Int = 1 << 16): DataFrame = {
    var cur = canonical(edges).localCheckpoint(eager = false)
    var curFp = fingerprint(cur)
    var converged = curFp._1 == 0L
    var round = 0
    while (!converged && round < maxRounds && curFp._1 > localFinishThreshold) {
      round += 1
      val next = smallStar(largeStar(cur)).localCheckpoint(eager = false)
      // At the fixpoint both stars are identities, so next == cur
      // (sets of canonical pairs). The exact one-sided difference
      // runs only when the one-job fingerprints already agree —
      // progressing rounds pay a single count+xor aggregate, and
      // equal-count-but-still-moving rounds (which a count-only gate
      // lets through) skip the except too.
      val nextFp = fingerprint(next)
      converged = nextFp == curFp && next.except(cur).isEmpty
      if (sys.env.contains("GRAFT_CC_TRACE"))
        System.err.println(s"[cc] round $round fp=$nextFp converged=$converged")
      cur = next
      curFp = nextFp
    }
    // Ran out of rounds with the relation still both moving and too
    // large to close locally: the mid-contraction pairs are NOT labels
    // and returning them would silently mislabel components.
    if (!converged && curFp._1 > localFinishThreshold)
      throw new IllegalStateException(
        s"connected components did not converge in $maxRounds rounds " +
          s"(${curFp._1} pairs remain > localFinishThreshold=$localFinishThreshold); " +
          "raise maxRounds or the threshold")
    val labels =
      if (!converged && curFp._1 > 0 && curFp._1 <= localFinishThreshold)
        localFinishLabels(s, cur)
      else cur.select(col("hi").as("id"), col("lo").as("component"))
    vertices.select(col("id").cast("long").as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Exact closure of a threshold-sized pair relation: union-find with
    * path compression, roots kept at the minimum id (so labels match
    * the distributed fixpoint's min-id contract bit for bit). */
  private def localFinishLabels(s: SparkSession, e: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val pairs = e.select(col("hi"), col("lo")).collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x
      while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    pairs.foreach { p =>
      val a = find(p.getLong(0)); val b = find(p.getLong(1))
      if (a != b) { if (a < b) parent.put(b, a) else parent.put(a, b) }
    }
    val nodes = pairs.iterator.flatMap(p => Iterator(p.getLong(0), p.getLong(1)))
      .toArray.distinct.sorted
    val rows: Seq[Row] = nodes.toIndexedSeq.map(n => Row(n, find(n)))
    s.createDataFrame(rows.asJava, StructType(Seq(
      StructField("id", LongType), StructField("component", LongType))))
  }
}
