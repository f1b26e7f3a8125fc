package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** DAG longest-path leveling (SURVEY §2 A29) — "dependency depth" of
  * every node in a directed acyclic edit graph: the scheduling /
  * BOM-explosion primitive (how many sequential steps feed this
  * node?). Here over the DIRECTED size-up edit rule underlying the
  * widened part edit-graph (same brand, size + 1 or + 2 — acyclic
  * because size strictly increases; the A-family's symmetrized graph
  * is this DAG unioned with its reverse).
  *
  * Scale shape — iterate the QUOTIENT, not the facts: depth is a pure
  * function of the (brand, size) equivalence class (two parts of one
  * class have identical predecessor classes), and the class domain is
  * bounded by |brands| × |size domain| at ANY fact scale. So the
  * plan is: one distributed distinct to derive the class set, an
  * in-process longest-path DP over it (sizes ascend, so one pass in
  * size order is the topological sweep), and one broadcast join
  * stamping class depths back onto the fact-scaled part table. A
  * naive per-part relaxation would run ~50 scheduler rounds of
  * fact-sized joins for the same integers — the quotient shrinks the
  * iteration to a driver array and leaves facts with a single
  * broadcast-joined scan.
  *
  * The class-domain bound is a ROUTING decision (round-10: the
  * Dispatch discipline — round 9's `require()` THREW past it): the
  * probe's collected class rows feed the driver DP directly; a class
  * domain past the bound (size behaving like a continuous value, say)
  * routes to [[classDepthDistributed]] — per-level relaxation over
  * the distributed class graph — and still answers, with the depth
  * stamp becoming a shuffle join instead of a broadcast.
  *
  * Both routes enforce the SAME declared chain-depth bound of 59: the
  * oracle's recursive walk bounds its state enumeration there, so a
  * deeper-than-expected class chain fails LOUDLY on the engine side
  * instead of silently diverging (the s_knn_binary dims-guard
  * discipline).
  */
object DagDepth {

  /** Declared cross-engine chain-depth contract (see class doc). */
  val MAX_CHAIN: Long = 59L

  /** Longest-path depth of every part in the size-up edit DAG.
    * Returns (part, depth): depth 0 = no in-edges (no same-brand part
    * 1–2 sizes below), else 1 + max over predecessor classes. */
  def partEditDepth(s: SparkSession, sfDir: String,
                    bound: Int = -1): DataFrame = {
    import s.implicits._
    depthOf(s, graft.Tables.part(s, sfDir)
      .select($"p_partkey".as("part"), $"p_brand".as("brand"),
        $"p_size".as("size")), bound)
  }

  /** The routed engine over any `(part, brand, size)` vertex table —
    * factored out so the routing spec and the GraphDB facade can
    * drive arbitrary tables. Normalizes to the facade's documented
    * column types (part/size → LONG) up front, so int- and long-typed
    * callers land on identical code paths. */
  private[graph] def depthOf(s: SparkSession, p0: DataFrame,
                             bound: Int = -1): DataFrame = {
    import s.implicits._
    val p = p0.select($"part".cast("long").as("part"), $"brand",
      $"size".cast("long").as("size"))
    val classes = p.select($"brand", $"size").distinct()
    // class-domain bound single-sourced from [[Quotient.maxClasses]]
    // (round-13, verdict #6 — was a private 2^16 constant that could
    // drift from the sibling routes' clamp)
    Quotient.probeRows(classes, math.min(
        Quotient.resolve(bound, s, Quotient.maxClasses), Quotient.maxClasses(s))) match {
      case Some(rows) =>
        val classDepth = classDepthDriver(s,
          rows.map(r => (r.getString(0), r.getLong(1))))
        p.join(broadcast(classDepth), Seq("brand", "size"))
          .select($"part", $"depth")
      case None =>
        p.join(classDepthDistributed(s, classes), Seq("brand", "size"))
          .select($"part", $"depth")
    }
  }

  /** The in-process DP over probed class rows: ascending size order
    * IS a topological order of the class DAG. */
  private def classDepthDriver(s: SparkSession,
                               classes: Array[(String, Long)]): DataFrame = {
    import scala.collection.mutable
    import scala.jdk.CollectionConverters._
    val depth = mutable.HashMap.empty[(String, Long), Long]
    classes.groupBy(_._1).foreach { case (brand, cls) =>
      val present = cls.map(_._2).toSet
      cls.map(_._2).distinct.sorted.foreach { sz =>
        val preds = Seq(sz - 1, sz - 2).filter(present)
          .map(ps => depth((brand, ps)) + 1L)
        depth.update((brand, sz), if (preds.isEmpty) 0L else preds.max)
      }
    }
    require(depth.isEmpty || depth.values.max <= MAX_CHAIN,
      s"class-DAG chain depth ${depth.values.max} exceeds the declared bound of $MAX_CHAIN " +
        "(size domain wider than expected) — raise the bound in BOTH engines")
    val rows = classes.map { case (b, sz) => Row(b, sz, depth((b, sz))) }.toSeq
    val schema = StructType(Seq(StructField("brand", StringType),
      StructField("size", LongType), StructField("depth", LongType)))
    s.createDataFrame(rows.asJava, schema)
  }

  /** The general engine: max-plus PATH DOUBLING over the DISTRIBUTED
    * class graph. Round k holds P_k = the longest path length for
    * every ordered class pair reachable in ≤ 2^k edges;
    * P_{k+1}(u, v) = max(P_k(u, v), max over w of P_k(u, w) + P_k(w, v))
    * — one self-join + one partial-aggregable max per round, reaching
    * the all-pairs longest-path fixpoint in ⌈log₂ chain⌉ rounds where
    * the per-level relaxation needed `chain` rounds (~50 scheduler-
    * bound tiny jobs was the measured cost — engines.jsonl's flat
    * ~11 s dagdepth_fallback at every rung). The pair table stays
    * class-linear: the declared chain bound caps any path at 59 edges
    * of delta ≤ 2, so each node reaches ≤ 118 successors — and a
    * per-round max-length guard throws the contract violation LOUDLY
    * before the table could grow past it. depth(c) is then the max
    * incoming path length (0 for sources). Per-round state is
    * checkpointed with the KCore DISK discipline. Returns
    * (brand, size, depth) for every class. */
  private[graph] def classDepthDistributed(s: SparkSession,
                                           classes: DataFrame): DataFrame = {
    import s.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val cls = classes.select($"brand", $"size").distinct()
      .localCheckpoint(false, lvl)
    // P_0: the directed class edges under the size-up rule,
    // pred --(+1|+2)--> succ, each a longest-≤1-edge path of length 1
    var paths = cls.select($"brand", $"size".as("u"))
      .join(cls.select($"brand", $"size".as("v")), Seq("brand"))
      .filter($"v" - $"u" === 1 || $"v" - $"u" === 2)
      .select($"brand", $"u", $"v", lit(1L).as("len"))
      .localCheckpoint(true, lvl)
    // fixpoint in ⌈log₂ MAX_CHAIN⌉ productive rounds + 1 to observe;
    // convergence rides the (monotone, bounded: ≤ |cls|·118 rows of
    // len ≤ 59) length SUM, one scalar per round
    val maxIter = 64 - java.lang.Long.numberOfLeadingZeros(MAX_CHAIN) + 2
    var total = paths.agg(coalesce(sum($"len"), lit(0L))).as[Long].head()
    var converged = total == 0L // no edges: every class is depth 0
    var iter = 0
    def freeAndThrow(depth: Long): Nothing = {
      KTruss.freeCheckpoint(paths)
      KTruss.freeCheckpoint(cls)
      throw new IllegalArgumentException(
        s"requirement failed: class-DAG chain depth $depth exceeds the declared bound of $MAX_CHAIN " +
          "(size domain wider than expected) — raise the bound in BOTH engines")
    }
    while (!converged && iter < maxIter) {
      val composed = paths.as("a")
        .join(paths.as("b"),
          col("a.brand") === col("b.brand") && col("a.v") === col("b.u"))
        .select(col("a.brand").as("brand"), col("a.u").as("u"),
          col("b.v").as("v"), (col("a.len") + col("b.len")).as("len"))
      val next = paths.union(composed)
        .groupBy($"brand", $"u", $"v")
        .agg(max($"len").as("len"))
        .localCheckpoint(true, lvl)
      val (t2, longest) = next
        .agg(coalesce(sum($"len"), lit(0L)), coalesce(max($"len"), lit(0L)))
        .as[(Long, Long)].head()
      KTruss.freeCheckpoint(paths)
      paths = next
      // the guard that keeps the doubling bounded: past the contract,
      // lengths (and the pair table) would grow geometrically — bail
      // the moment the contract is violated, same message as the DP
      if (longest > MAX_CHAIN) freeAndThrow(longest)
      // fixpoint proofs, cheapest first: a longest path strictly
      // below this round's 2^(iter+1)-edge coverage means NO longer
      // path exists (any longer one would have a covered prefix
      // exceeding it) — that skips the usual observe-no-change round;
      // the monotone length sum is the general backstop
      converged = longest < (1L << (iter + 1)) || t2 == total
      total = t2
      iter += 1
    }
    if (!converged) {
      // unreachable while the guard holds (lengths ≤ MAX_CHAIN force
      // the fixpoint inside maxIter) — kept as the loud backstop
      KTruss.freeCheckpoint(paths)
      KTruss.freeCheckpoint(cls)
      throw new IllegalStateException(
        s"class-DAG path doubling did not converge within $maxIter rounds — " +
          s"chain deeper than the declared bound of $MAX_CHAIN; raise it in BOTH engines")
    }
    // depth(c) = longest incoming path; sources (no incoming pair) = 0
    val depth = cls
      .join(paths.groupBy($"brand", $"v").agg(max($"len").as("d"))
          .select($"brand", $"v".as("size"), $"d"),
        Seq("brand", "size"), "left")
      .select($"brand", $"size", coalesce($"d", lit(0L)).as("depth"))
      .localCheckpoint(true, lvl)
    // the loop-long checkpoints are dead once depth is materialized
    KTruss.freeCheckpoint(paths)
    KTruss.freeCheckpoint(cls)
    depth
  }
}
