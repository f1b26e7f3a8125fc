package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** One lineitem of an order item-graph (SURVEY §4: orders are
  * "molecules", their lineitems are atoms). */
final case class OrderItem(okey: Long, node: Int, supp: Long)

/** Census row: one distinct canonical subgraph of one order. */
final case class CensusRow(o_orderkey: Long, subgraph_hash: String, size: Int)

/** Per-order graph with its census hash set (for pairwise GED). */
final case class OrderGraph(okey: Long, nodes: Seq[Int],
                            edges: Seq[Seq[Int]], hashes: Seq[String]) {
  def n: Int = nodes.size
  def local: Subgraphs.LocalGraph = Subgraphs.LocalGraph(nodes.toVector.sorted,
    edges.map(e => (math.min(e(0), e(1)), math.max(e(0), e(1)))).toSet)
}

/** Pairwise similarity row (mcs.py:285-346's result surface). */
final case class GedRow(order_a: Long, order_b: Long,
                        n_nodes_a: Long, n_nodes_b: Long, shared_subgraphs: Long,
                        tanimoto: Double, approx_ged: Double, exact_ged: Long)

/** Subgraph census + similarity pack (SURVEY §2 B1–B6) — the
  * reference's second engine re-expressed for Spark.
  *
  * Entity graphs are per-order item graphs: nodes are the order's
  * lineitems (id = l_linenumber), and two items bond when they share
  * a supplier or are adjacent in line number. Entity graphs are
  * molecule-sized, so the census is embarrassingly parallel: ONE
  * shuffle groups each order's items, then [[Subgraphs.census]] +
  * [[WLHash]] run as pure Scala inside mapGroups — the Spark-native
  * shape for per-entity local algorithms (no driver loops, no
  * cross-entity traffic; scales linearly in #orders at 100 TB).
  *
  * Orders above [[Subgraphs.MAX_NODES]] items are excluded by the
  * validation rule (B6), mirroring the reference's max_atoms=10
  * constraint (mcs.py:27-54).
  *
  * These queries have no SQL oracle (WL hashing is not expressible in
  * DuckDB SQL) — the driver records rows-only checks and the real
  * verification lives in the ScalaTest specs (hand-computed census /
  * hash / GED examples).
  */
object SubgraphPack extends QueryPack {

  private val CENSUS_MAX_SIZE = 4
  private val GED_KEY_BOUND = 100 // pairwise queries: orders with okey < bound
  private val GED_EXACT_MAX_N = 6 // exact GED only when both graphs ≤ 6 nodes

  private def items(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey".as("okey"), $"l_linenumber".as("node"), $"l_suppkey".as("supp"))
  }

  /** Build the local graph of one order; None if validation rejects. */
  private def buildGraph(its: Seq[OrderItem]): Option[Subgraphs.LocalGraph] = {
    val nodes = its.map(_.node)
    val bySupp = its.groupBy(_.supp).values.filter(_.size > 1)
    val suppEdges = bySupp.flatMap(g => g.map(_.node).sorted.combinations(2).map(p => (p(0), p(1))))
    val nodeSet = nodes.toSet
    val adjEdges = nodes.filter(n => nodeSet(n + 1)).map(n => (n, n + 1))
    Subgraphs.validate(nodes, (suppEdges ++ adjEdges).toSeq).toOption
  }

  /** The B3 index aggregation, shared with B4's query-by-size.
    * first(size) is safe: the WL hash digests the node count, so a
    * hash functionally determines its size. */
  private def indexDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    censusDs(s, d).toDF()
      .groupBy($"subgraph_hash")
      .agg(first($"size").cast("long").as("size"), count(lit(1)).as("frequency"))
  }

  private def censusDs(s: SparkSession, d: String) = {
    import s.implicits._
    items(s, d).as[OrderItem]
      .groupByKey(_.okey)
      .flatMapGroups { (okey, it) =>
        buildGraph(it.toSeq).iterator.flatMap { g =>
          Subgraphs.census(g, CENSUS_MAX_SIZE).map { case (h, sz) => CensusRow(okey, h, sz) }
        }
      }
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1/B2: connected-subgraph census, deduped by WL canonical hash.
    "g_subgraph_census" -> { (s, d) =>
      import s.implicits._
      censusDs(s, d).toDF()
        .select($"o_orderkey", $"subgraph_hash", $"size".cast("long").as("size"))
    },

    // B3: global subgraph index — hash → size + parent frequency
    // (SubgraphDatabase.add_subgraph's merge-on-conflict, mcs.py:101-144).
    "g_subgraph_index" -> { (s, d) => indexDf(s, d) },

    // B4: query-by-size over the index (mcs.py:146-164).
    "g_subgraph_by_size" -> { (s, d) =>
      import s.implicits._
      indexDf(s, d)
        .filter($"size" === 3)
        .select($"subgraph_hash", $"frequency")
    },

    // B5: pairwise Tanimoto + approx GED + exact GED over a bounded
    // order range (mcs.py:285-346).
    "g_ged_pairs" -> { (s, d) =>
      import s.implicits._
      // flatMapGroups: validation-rejected orders (B6, > MAX_NODES
      // items) are EXCLUDED — the same rule the census queries apply
      // (mcs.py drops over-limit molecules); a degenerate empty-graph
      // row would contradict that contract.
      val graphs = items(s, d).filter($"okey" < GED_KEY_BOUND).as[OrderItem]
        .groupByKey(_.okey)
        .flatMapGroups { (okey, it) =>
          buildGraph(it.toSeq).iterator.map { g =>
            val hashes = Subgraphs.census(g, CENSUS_MAX_SIZE).map(_._1)
            OrderGraph(okey, g.nodes, g.edges.toSeq.map(e => Seq(e._1, e._2)), hashes)
          }
        }
      graphs.as("a").joinWith(graphs.as("b"), col("a.okey") < col("b.okey"), "inner")
        .map { case (a, b) =>
          val ha = a.hashes.toSet; val hb = b.hashes.toSet
          val shared = (ha & hb).size
          val union = (ha | hb).size
          val tanimoto = if (union == 0) 0.0 else shared.toDouble / union.toDouble
          val maxNodes = math.max(a.n, b.n)
          val maxShared = math.min(ha.size, hb.size)
          val approx =
            if (maxShared == 0) maxNodes.toDouble
            else maxNodes.toDouble * (1.0 - shared.toDouble / maxShared.toDouble)
          val exact =
            if (a.n == 0 || b.n == 0 || a.n > GED_EXACT_MAX_N || b.n > GED_EXACT_MAX_N) -1L
            else Subgraphs.exactGed(a.local, b.local).toLong
          def r3(x: Double): Double = math.rint(x * 1000.0) / 1000.0
          GedRow(a.okey, b.okey, a.n.toLong, b.n.toLong, shared.toLong,
            r3(tanimoto), r3(approx), exact)
        }
        .toDF()
    },
  )

  override def oracles: Map[String, String] = Map.empty
}
