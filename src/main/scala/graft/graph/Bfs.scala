package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative frontier-join BFS and wavefront expansion over an edge
  * DataFrame (src, dst).
  *
  * Spark-first re-expression of the reference's in-memory traversal:
  * `query()` keeps previous/current/next wavefront *sets* on one
  * machine (main.py:272-305) and `add_relations` expands a frontier
  * depth-bounded (main.py:212-242). Here the frontier and the visited
  * set are DataFrames — one hash join per wave, nothing collected to
  * the driver.
  *
  * Scale design (SURVEY §5): edges are hash-partitioned on `src` once
  * and persisted, so every wave's join reuses the same exchange; the
  * frontier side is small and reshuffles cheaply (or AQE broadcasts
  * it). Every wave is localCheckpoint-ed (eager) to truncate lineage —
  * without that the plan doubles per wave and a deep traversal dies in
  * the optimizer long before any shuffle does.
  */
object Bfs {

  /** Truncate plan lineage WITHOUT a dedicated materialization job:
    * a NON-eager localCheckpoint severs the logical plan (fresh
    * LogicalRDD — also what keeps each wave's self-join against the
    * shared edge table unambiguous) and defers block persistence to
    * the next real job — bfs's per-wave loop-control isEmpty, or (in
    * depth-bounded expand, which has no in-loop action) the caller's
    * first action after the loop. An eager checkpoint per wave was
    * ~3 scheduler round-trips per wave of pure overhead. */
  private def settle(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = false)

  /** Multi-root BFS. `seeds` has columns (root, node); returns
    * (root, node, wave) for every reachable node, where the seed
    * itself is wave 1 — the reference counts the source's wave as 1
    * and returns it immediately when source == target
    * (main.py:286-292). Unreachable nodes are simply absent (callers
    * emit the reference's -1 via a left join).
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxWaves: Int = 100): DataFrame = {
    val e = edges.select("src", "dst").repartition(col("src")).persist()
    // distinct: one output row per (root, node) seed however many
    // times a caller repeats it — the same set semantics every later
    // wave already has (and the bounded path mirrors).
    var visited = seeds.select(col("root"), col("node")).distinct()
      .withColumn("wave", lit(1L))
      .localCheckpoint(eager = false)
    var frontier = visited
    var wave = 1L
    while (wave < maxWaves && !frontier.isEmpty) {
      wave += 1
      val next = settle(
        frontier.join(e, frontier("node") === e("src"))
          .select(frontier("root"), e("dst").as("node"))
          .distinct()
          .join(visited.select("root", "node"), Seq("root", "node"), "left_anti")
          .withColumn("wave", lit(wave)))
      visited = settle(visited.union(next))
      frontier = next
    }
    e.unpersist()
    visited
  }

  /** Dimension-bounded BFS fast path — same contract as [[bfs]], for
    * graphs whose NODE set is a bounded dimension (e.g. the nation
    * trade graph: deriving its edges scans the facts, but the graph
    * itself is ≤ |dims|² rows). One distributed job materializes that
    * dim-sized edge set; the traversal then runs on the driver like
    * any other broadcast-dimension computation, instead of paying
    * join+distinct+anti-join shuffles per wave to move a few hundred
    * rows. Guarded: refuses fact-sized inputs. */
  def bfsBounded(edges: DataFrame, seeds: DataFrame, maxWaves: Int = 100): DataFrame = {
    // single-sourced route bound (round-13, verdict #6)
    val limit = Quotient.probeBound(edges.sparkSession)
    // Node ids normalize to BIGINT — the same coercion the distributed
    // path's seed∪frontier union applies, and the graph contract
    // (SURVEY: all node id columns are emitted as BIGINT). The limit
    // rides INSIDE the collect so a fact-sized input is refused after
    // shipping at most limit+1 rows, not after an OOM-sized collect.
    // Null ids never join in the distributed path — drop them here so
    // the fast path matches instead of NPE-ing in getLong.
    val e = Quotient.probeRows(normEdges(edges), limit).getOrElse(
      throw new IllegalArgumentException(
        s"requirement failed: bfsBounded edge set exceeds $limit rows — not dimension-bounded; use bfs"))
    val seedRows = Quotient.probeRows(normSeeds(seeds), limit).getOrElse(
      throw new IllegalArgumentException(
        s"requirement failed: bfsBounded seed set exceeds $limit rows — not dimension-bounded; use bfs"))
    boundedSweep(edges.sparkSession, e, seedRows, maxWaves)
  }

  /** ROUTED multi-root BFS (round-10: the Dispatch discipline applied
    * to the all-pairs spine) — same contract as [[bfs]]/[[bfsBounded]],
    * but the dimension bound is a ROUTING decision, not a guard:
    * within `bound`, the probe's collected edge/seed rows feed the
    * in-process sweep directly (the probe IS the fast path's collect —
    * no second job); past it, the distributed frontier-join loop runs
    * instead of throwing. Both routes emit identical (root, node,
    * wave) multisets on long-typed inputs (FallbackRoutingSpec). */
  def bfsAuto(edges: DataFrame, seeds: DataFrame, maxWaves: Int = 100,
              bound: Int = -1): DataFrame = {
    val eff = Quotient.resolve(bound, edges.sparkSession, Quotient.probeBound)
    // seeds probe FIRST: it is the smaller side (≤ |V| rows vs |E|),
    // so an over-bound seed set routes to the distributed loop before
    // any near-limit edge collect is paid and thrown away.
    // Both routes consume the NORMALIZED frames (BIGINT ids, null ids
    // dropped, seed multiplicity collapsed), so schema and row set
    // cannot differ as a function of which side of the bound the data
    // lands on.
    val routed = for {
      sd <- Quotient.probeRows(normSeeds(seeds), eff)
      e <- Quotient.probeRows(normEdges(edges), eff)
    } yield boundedSweep(edges.sparkSession, e, sd, maxWaves)
    routed.getOrElse(bfs(normEdges(edges), normSeeds(seeds), maxWaves))
  }

  private def normEdges(edges: DataFrame): DataFrame =
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .filter(col("src").isNotNull && col("dst").isNotNull)

  private def normSeeds(seeds: DataFrame): DataFrame =
    seeds.select(col("root").cast("long"), col("node").cast("long"))
      .filter(col("root").isNotNull && col("node").isNotNull)
      .distinct() // same multiplicity contract as bfs (which dedups seeds too)

  /** The in-process multi-root sweep both bounded entry points share:
    * one adjacency map, one frontier loop per root, (root, node, wave)
    * rows out — wave semantics identical to [[bfs]]. */
  private def boundedSweep(spark: org.apache.spark.sql.SparkSession,
                           e: Array[org.apache.spark.sql.Row],
                           seedRows: Array[org.apache.spark.sql.Row],
                           maxWaves: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import scala.collection.mutable
    import scala.jdk.CollectionConverters._
    val adj = mutable.HashMap.empty[Long, mutable.ArrayBuffer[Long]]
    e.foreach(r => adj.getOrElseUpdate(r.getLong(0), mutable.ArrayBuffer.empty) += r.getLong(1))
    val out = mutable.ArrayBuffer.empty[Row]
    seedRows.groupBy(_.getLong(0)).foreach { case (root, rs) =>
      val wave = mutable.HashMap.empty[Long, Long]
      var frontier = rs.map(_.getLong(1)).distinct.toSeq
      frontier.foreach(n => wave.update(n, 1L))
      var w = 1L
      while (w < maxWaves && frontier.nonEmpty) {
        w += 1
        frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .distinct.filterNot(wave.contains)
        frontier.foreach(n => wave.update(n, w))
      }
      wave.foreach { case (n, wv) => out += Row(root, n, wv) }
    }
    val schema = StructType(Seq(
      StructField("root", LongType),
      StructField("node", LongType),
      StructField("wave", LongType)))
    spark.createDataFrame(out.sortBy(r => (r.getLong(0), r.getLong(1))).asJava, schema)
  }

  /** Single-pair early-exit BFS — the reference's `query(from, to)`
    * (main.py:272-305): source counts as wave 1, each hop adds one,
    * -1 if unreachable; src == dst short-circuits to 1 without
    * touching the graph. Distributed frontier loop like [[bfs]], but
    * it STOPS the moment the target enters the frontier — on a
    * 100 TB graph with a 3-hop answer, that is 3 co-partitioned joins
    * total, not a full reachability closure. Each wave's loop control
    * (frontier size + target hit) is a single aggregation job.
    * [[GraphDB.query]] delegates here; g_query_pair puts the same
    * code path on the driver's oracle signal. */
  def wavePair(edges: DataFrame, src: Long, dst: Long, maxWaves: Int = 100): Long = {
    if (src == dst) return 1L
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst")).repartition(col("src")).persist()
    try {
      var frontier = settle(Seq(src).toDF("node"))
      var visited = frontier
      var wave = 1L
      while (wave <= maxWaves) {
        // one job decides both loop conditions
        val (n, hit) = frontier
          .agg(count(lit(1)), max(when(col("node") === dst, 1L)))
          .as[(Long, Option[Long])].head()
        if (hit.contains(1L)) return wave
        if (n == 0) return -1L
        wave += 1
        frontier = settle(
          frontier.join(e, frontier("node") === e("src"))
            .select(e("dst").as("node")).distinct()
            .join(visited, Seq("node"), "left_anti"))
        visited = settle(visited.union(frontier))
      }
      -1L
    } finally e.unpersist()
  }

  /** Batched early-exit pair queries — [[wavePair]]'s semantics for a
    * SET of (src, dst) probes in ONE traversal. Sequential wavePair
    * calls pay the per-wave scheduler jobs once per pair; here the
    * frontier is root-tagged, so every wave's expansion join AND its
    * single loop-control job are shared by all still-open probes
    * (pairs sharing a source also share the traversal outright). Per
    * probe the semantics are identical: src == dst answers 1 without
    * touching the graph, a probe stops contributing the moment its
    * target is reached, a root whose frontier empties answers −1 for
    * its remaining probes.
    * Returns (src, dst, wave) in the input's (src, dst) order. */
  def wavePairs(edges: DataFrame, pairs: Seq[(Long, Long)], maxWaves: Int = 100)
    : Seq[(Long, Long, Long)] = {
    val spark = edges.sparkSession
    import spark.implicits._
    val answered = scala.collection.mutable.Map.empty[(Long, Long), Long]
    pairs.distinct.foreach { case (a, b) => if (a == b) answered((a, b)) = 1L }
    var open: Seq[(Long, Long)] = pairs.distinct.filterNot(answered.contains)
    if (open.isEmpty) return pairs.map(p => (p._1, p._2, answered(p)))
    val e = edges.select(col("src"), col("dst")).repartition(col("src")).persist()
    try {
      var frontier = settle(open.map(_._1).distinct.toDF("root")
        .select($"root", $"root".as("node")))
      var visited = frontier
      var wave = 1L
      while (wave <= maxWaves && open.nonEmpty) {
        // ONE job per wave decides loop control for every open probe:
        // per-root frontier size + which targets this wave reached.
        // open is dimension-bounded (a probe list), so the broadcast
        // and the collected per-root rows are both tiny.
        val targets = broadcast(open.toDF("troot", "tdst"))
        val perRoot = frontier
          .join(targets, $"root" === $"troot" && $"node" === $"tdst", "left")
          .groupBy($"root")
          .agg(collect_set($"tdst").as("hit_dsts"))
          .as[(Long, Seq[Long])].collect().toMap
        open.foreach { case (a, b) =>
          if (perRoot.get(a).exists(_.contains(b))) answered((a, b)) = wave
          else if (!perRoot.contains(a)) answered((a, b)) = -1L // frontier died
        }
        open = open.filterNot(answered.contains)
        wave += 1
        if (open.nonEmpty) {
          val liveRoots = open.map(_._1).distinct
          frontier = settle(
            frontier.filter($"root".isin(liveRoots: _*))
              .join(e, frontier("node") === e("src"))
              .select($"root", e("dst").as("node")).distinct()
              .join(visited, Seq("root", "node"), "left_anti"))
          visited = settle(visited.union(frontier))
        }
      }
      open.foreach(p => answered(p) = -1L) // maxWaves exhausted
      pairs.map(p => (p._1, p._2, answered(p)))
    } finally e.unpersist()
  }

  /** Depth-bounded wavefront expansion (add_relations,
    * main.py:212-242): seeds are wave 0, each wave reaches the
    * neighbors not already seen, up to `depth` waves. Returns
    * (node, first_wave).
    */
  def expand(edges: DataFrame, seedNodes: DataFrame, depth: Int): DataFrame = {
    val e = edges.select("src", "dst").repartition(col("src")).persist()
    // distinct: one output row per seed node however many times a
    // caller repeats it — the set semantics bfs() applies to seeds.
    var visited = seedNodes.select(col("node")).distinct()
      .select(col("node"), lit(0L).as("first_wave"))
      .localCheckpoint(eager = false)
    var frontier = visited
    var wave = 0L
    // No per-wave isEmpty probe: the loop is depth-bounded (depth is
    // small by contract), and once a frontier IS empty every later
    // wave's join is empty-input-fast — cheaper than paying one
    // scheduler job per wave just to maybe exit early.
    while (wave < depth) {
      wave += 1
      val next = settle(
        frontier.join(e, frontier("node") === e("src"))
          .select(e("dst").as("node"))
          .distinct()
          .join(visited.select("node"), Seq("node"), "left_anti")
          .withColumn("first_wave", lit(wave)))
      visited = settle(visited.union(next))
      frontier = next
    }
    // The loop runs no actions (that's the point — no per-wave jobs),
    // so materialize the result ONCE while the edge cache is still
    // alive; unpersisting first would make the caller's first action
    // recompute e for every wave.
    val out = visited.localCheckpoint()
    e.unpersist()
    out
  }
}
