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

  /** Probe bound on the collected class domain. */
  val CLASS_BOUND: Int = 1 << 16

  /** Declared cross-engine chain-depth contract (see class doc). */
  val MAX_CHAIN: Long = 59L

  /** Longest-path depth of every part in the size-up edit DAG.
    * Returns (part, depth): depth 0 = no in-edges (no same-brand part
    * 1–2 sizes below), else 1 + max over predecessor classes. */
  def partEditDepth(s: SparkSession, sfDir: String,
                    bound: Int = CLASS_BOUND): DataFrame = {
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
                             bound: Int = CLASS_BOUND): DataFrame = {
    import s.implicits._
    val p = p0.select($"part".cast("long").as("part"), $"brand",
      $"size".cast("long").as("size"))
    val classes = p.select($"brand", $"size").distinct()
    Quotient.probeRows(classes, math.min(bound, CLASS_BOUND)) match {
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

  /** The general engine: per-level relaxation over the DISTRIBUTED
    * class graph —
    *   depth₀(c) = 0;  depthₖ₊₁(c) = max(0, max over preds (depthₖ + 1))
    * is monotone non-decreasing and reaches the longest-path fixpoint
    * in (longest chain) rounds, so the declared 59-chain contract
    * bounds the loop at 60 productive rounds + 1 to observe the
    * fixpoint. Each round is one self-contained equi-join + one
    * partial-aggregable max; convergence rides the (monotone) depth
    * SUM, one scalar per round. Per-round state is class-domain-sized,
    * checkpointed with the KCore DISK discipline. Returns
    * (brand, size, depth) for every class. */
  private[graph] def classDepthDistributed(s: SparkSession,
                                           classes: DataFrame): DataFrame = {
    import s.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val cls = classes.select($"brand", $"size").distinct()
      .localCheckpoint(false, lvl)
    // directed class edges under the size-up rule: pred --(+1|+2)--> succ
    val edges = cls.select($"brand", $"size".as("psize"))
      .join(cls.select($"brand", $"size"),
        Seq("brand"))
      .filter($"size" - $"psize" === 1 || $"size" - $"psize" === 2)
      .select($"brand", $"psize", $"size")
      .localCheckpoint(false, lvl)
    var depth = cls.select($"brand", $"size", lit(0L).as("depth"))
      .localCheckpoint(true, lvl)
    var total = -1L
    var converged = false
    var iter = 0
    val maxIter = MAX_CHAIN.toInt + 2
    while (!converged && iter < maxIter) {
      val msgs = edges
        .join(depth.select($"brand", $"size".as("psize"), $"depth"),
          Seq("brand", "psize"))
        .groupBy($"brand", $"size")
        .agg(max($"depth" + 1L).as("nd"))
      val next = cls
        .join(msgs, Seq("brand", "size"), "left")
        .select($"brand", $"size", coalesce($"nd", lit(0L)).as("depth"))
        .localCheckpoint(true, lvl)
      val t2 = next.agg(coalesce(sum($"depth"), lit(0L))).as[Long].head()
      converged = t2 == total
      total = t2
      KTruss.freeCheckpoint(depth)
      depth = next
      iter += 1
    }
    // the loop-long lazy checkpoints are dead once the final depth
    // generation is materialized — free them on EVERY exit (the
    // engine-wide free-on-throw discipline)
    KTruss.freeCheckpoint(cls)
    KTruss.freeCheckpoint(edges)
    if (!converged) {
      KTruss.freeCheckpoint(depth)
      throw new IllegalStateException(
        s"class-DAG depth relaxation did not converge within $maxIter rounds — " +
          s"chain deeper than the declared bound of $MAX_CHAIN; raise it in BOTH engines")
    }
    // the EXPLICIT form of the driver DP's chain guard (convergence
    // inside maxIter alone would admit a chain one past the bound)
    val deepest = depth.agg(coalesce(max($"depth"), lit(0L))).as[Long].head()
    if (deepest > MAX_CHAIN) {
      KTruss.freeCheckpoint(depth)
      throw new IllegalArgumentException(
        s"requirement failed: class-DAG chain depth $deepest exceeds the declared bound of $MAX_CHAIN " +
          "(size domain wider than expected) — raise the bound in BOTH engines")
    }
    depth
  }
}
