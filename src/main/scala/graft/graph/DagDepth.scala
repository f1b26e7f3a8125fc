package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

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
  * size order is the topological sweep; the collect is limit-guarded
  * like every dimension-bounded fast path), and one broadcast join
  * stamping class depths back onto the fact-scaled part table. A
  * naive per-part relaxation would run ~50 scheduler rounds of
  * fact-sized joins for the same integers — the quotient shrinks the
  * iteration to a driver array and leaves facts with a single
  * broadcast-joined scan.
  */
object DagDepth {

  /** Longest-path depth of every part in the size-up edit DAG.
    * Returns (part, depth): depth 0 = no in-edges (no same-brand part
    * 1–2 sizes below), else 1 + max over predecessor classes. */
  def partEditDepth(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    import scala.collection.mutable
    import scala.jdk.CollectionConverters._
    val p = graft.Tables.part(s, sfDir)
      .select($"p_partkey".cast("long").as("part"), $"p_brand".as("brand"),
        $"p_size".cast("int").as("size"))
    val limit = 1 << 16
    // limit INSIDE the collect: a degenerate class domain (size as a
    // continuous value, say) is refused after at most limit+1 rows
    val classes = p.select($"brand", $"size").distinct()
      .limit(limit + 1).collect()
      .map(r => (r.getString(0), r.getInt(1)))
    require(classes.length <= limit,
      s"class domain exceeds $limit — quotient not dimension-bounded")
    val depth = mutable.HashMap.empty[(String, Int), Long]
    classes.groupBy(_._1).foreach { case (brand, cls) =>
      val present = cls.map(_._2).toSet
      // ascending size order IS a topological order of the class DAG
      cls.map(_._2).distinct.sorted.foreach { sz =>
        val preds = Seq(sz - 1, sz - 2).filter(present)
          .map(ps => depth((brand, ps)) + 1L)
        depth.update((brand, sz), if (preds.isEmpty) 0L else preds.max)
      }
    }
    // the oracle's recursive walk is bounded at depth < 60 (it must
    // bound its state enumeration); enforce the SAME contract here so
    // a deeper-than-expected class chain fails LOUDLY on the engine
    // side instead of silently diverging from the oracle — the
    // s_knn_binary dims-guard discipline
    require(depth.isEmpty || depth.values.max <= 59L,
      s"class-DAG chain depth ${depth.values.max} exceeds the declared bound of 59 " +
        "(size domain wider than expected) — raise the bound in BOTH engines")
    val rows = classes.map { case (b, sz) => Row(b, sz, depth((b, sz))) }.toSeq
    val schema = StructType(Seq(StructField("brand", StringType),
      StructField("size", IntegerType), StructField("depth", LongType)))
    val classDepth = s.createDataFrame(rows.asJava, schema)
    p.join(broadcast(classDepth), Seq("brand", "size"))
      .select($"part", $"depth")
  }
}
