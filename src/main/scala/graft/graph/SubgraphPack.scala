package graft.graph

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** One lineitem of an order item-graph (SURVEY §4: orders are
  * "molecules", their lineitems are atoms). */
final case class OrderItem(okey: Long, node: Int, supp: Long)

/** Census row: one distinct canonical subgraph of one order.
  * canon_key = "size:m:sortedDegSeq" — complete for connected ≤4-node
  * classes (see [[Subgraphs.censusDetailed]]), and the handle the SQL
  * oracle classifies by. */
final case class CensusRow(o_orderkey: Long, subgraph_hash: String, size: Int,
                           canon_key: String)

/** Per-order graph with its census hash set (for pairwise GED). */
final case class OrderGraph(okey: Long, nodes: Seq[Int],
                            edges: Seq[Seq[Int]], hashes: Seq[String]) {
  def n: Int = nodes.size
  def local: Subgraphs.LocalGraph = Subgraphs.LocalGraph(nodes.toVector.sorted,
    edges.map(e => (math.min(e(0), e(1)), math.max(e(0), e(1)))).toSet)
}

/** Per-order B6 validation verdict: reject_reason is the exact
  * message [[Subgraphs.validate]] produced (null when accepted);
  * node/edge counts of the canonical built graph ride along for
  * accepted orders so the edge-derivation rules are inside the same
  * cross-engine check. */
final case class ValidationRow(o_orderkey: Long, is_valid: Boolean,
                               reject_reason: Option[String],
                               n_nodes: Option[Long], n_edges: Option[Long])

/** One census class of one order (hash + node count + canon key) —
  * the per-order payload B7's pairwise MCS intersects. */
final case class SubgraphClass(hash: String, size: Int, ck: String)

/** Per-order census-class set for the MCS pair map. */
final case class McsGraph(okey: Long, classes: Seq[SubgraphClass])

/** B7 result row: the MAXIMAL common subgraph class of a pair —
  * node count, edge count, how many distinct shared classes exist at
  * that node count, and the canonical key of the picked class
  * (deterministic tiebreak: max size, then max edges, then
  * lexicographic canon key). All-zero + null key when the pair
  * shares nothing. */
final case class McsRow(order_a: Long, order_b: Long, mcs_size: Long,
                        mcs_edges: Long, n_shared_at_max: Long,
                        mcs_canon_key: Option[String])

/** Pairwise similarity row (mcs.py:285-346's result surface).
  * Every column except ged_ok is exactly cross-engine-computable via
  * the canon-key class sets; ged_ok carries the exact-GED guarantee
  * (|Δn| + |Δm| ≤ ged ≤ |Δn| + mₐ + m_b, trivially true when exact
  * GED is skipped for graphs over the size cap). */
final case class GedRow(order_a: Long, order_b: Long,
                        n_nodes_a: Long, n_nodes_b: Long,
                        n_edges_a: Long, n_edges_b: Long,
                        shared_subgraphs: Long,
                        tanimoto: Double, approx_ged: Double, ged_ok: Boolean)

/** Subgraph census + similarity pack (SURVEY §2 B1–B7) — the
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
  * Census/index/by-size carry a HARD cross-engine oracle: the DuckDB
  * side brute-force enumerates every ≤4-node subset and classifies it
  * by the (size, m, sorted degree sequence) canon key — complete for
  * connected ≤4-node graphs — then renames classes to WL hashes via a
  * 9-entry dictionary pinned by spec (see [[censusSql]]). Only
  * g_ged_pairs stays spec-verified (exact GED is not expressible in
  * SQL).
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

  /** Build the local graph of one order through the B6 validation
    * gate; Left(reason) when the order is rejected. */
  private def graphEither(its: Seq[OrderItem]): Either[String, Subgraphs.LocalGraph] = {
    val nodes = its.map(_.node)
    val bySupp = its.groupBy(_.supp).values.filter(_.size > 1)
    val suppEdges = bySupp.flatMap(g => g.map(_.node).sorted.combinations(2).map(p => (p(0), p(1))))
    val nodeSet = nodes.toSet
    val adjEdges = nodes.filter(n => nodeSet(n + 1)).map(n => (n, n + 1))
    Subgraphs.validate(nodes, (suppEdges ++ adjEdges).toSeq)
  }

  /** Build the local graph of one order; None if validation rejects. */
  private def buildGraph(its: Seq[OrderItem]): Option[Subgraphs.LocalGraph] =
    graphEither(its).toOption

  /** The bounded pair scaffolding B5 and B7 share: one payload row
    * per VALIDATED order with okey < GED_KEY_BOUND (validation-
    * rejected orders are EXCLUDED — the same rule the census queries
    * apply; mcs.py drops over-limit molecules, and a degenerate
    * empty-graph row would contradict that contract), self-joined on
    * a.okey < b.okey. Single-sourced so the two keys can never emit
    * different pair sets. The payload type needs an `okey` field for
    * the join condition. */
  private def boundedPairs[T <: Product : Encoder](s: SparkSession, d: String)(
      payload: (Long, Subgraphs.LocalGraph) => T): Dataset[(T, T)] = {
    import s.implicits._
    val graphs = items(s, d).filter($"okey" < GED_KEY_BOUND).as[OrderItem]
      .groupByKey(_.okey)
      .flatMapGroups { (okey, it) =>
        buildGraph(it.toSeq).iterator.map(g => payload(okey, g))
      }
    graphs.as("a").joinWith(graphs.as("b"), col("a.okey") < col("b.okey"), "inner")
  }

  /** The B3 index aggregation, shared with B4's query-by-size.
    * first(size)/first(canon_key) are safe: the WL hash digests the
    * node count and structure, so a hash functionally determines both. */
  private def indexDf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    censusDs(s, d).toDF()
      .groupBy($"subgraph_hash")
      .agg(first($"size").cast("long").as("size"), count(lit(1)).as("frequency"),
        first($"canon_key").as("canon_key"))
  }

  private def censusDs(s: SparkSession, d: String) = {
    import s.implicits._
    items(s, d).as[OrderItem]
      .groupByKey(_.okey)
      .flatMapGroups { (okey, it) =>
        buildGraph(it.toSeq).iterator.flatMap { g =>
          Subgraphs.censusDetailed(g, CENSUS_MAX_SIZE).map { case (h, sz, ck) =>
            CensusRow(okey, h, sz, ck)
          }
        }
      }
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1/B2: connected-subgraph census, deduped by WL canonical hash.
    // canon_key rides along so the DuckDB oracle can classify the same
    // subgraphs by brute-force enumeration (complete ≤ 4 nodes).
    "g_subgraph_census" -> { (s, d) =>
      import s.implicits._
      censusDs(s, d).toDF()
        .select($"o_orderkey", $"subgraph_hash", $"size".cast("long").as("size"),
          $"canon_key")
    },

    // B3: global subgraph index — hash → size + parent frequency
    // (SubgraphDatabase.add_subgraph's merge-on-conflict, mcs.py:101-144).
    "g_subgraph_index" -> { (s, d) => indexDf(s, d) },

    // B4: query-by-size over the index (mcs.py:146-164).
    "g_subgraph_by_size" -> { (s, d) =>
      import s.implicits._
      indexDf(s, d)
        .filter($"size" === 3)
        .select($"subgraph_hash", $"frequency", $"canon_key")
    },

    // B6 on the hard signal: per-order validation verdicts through
    // the REAL Subgraphs.validate code path (mcs.py:27-54's
    // constraint surface) — okey, accept/reject, the exact reject
    // message, and the canonical graph's node/edge counts for
    // accepted orders. The oracle reproduces the same verdicts
    // arithmetically (distinct-node size cap; duplicate (node, supp)
    // pairs become self-loop edges) and re-derives the edge counts
    // from the same supplier-share + adjacent-linenumber rules, so
    // validation semantics AND edge derivation are hash-compared.
    // Same one-shuffle per-order shape as the census.
    "g_validation" -> { (s, d) =>
      import s.implicits._
      items(s, d).as[OrderItem]
        .groupByKey(_.okey)
        .mapGroups { (okey, it) =>
          graphEither(it.toSeq) match {
            case Left(reason) =>
              ValidationRow(okey, is_valid = false, Some(reason), None, None)
            case Right(g) =>
              ValidationRow(okey, is_valid = true, None, Some(g.n.toLong), Some(g.m.toLong))
          }
        }
        .toDF()
    },

    // B7 (round-12): MAXIMUM COMMON SUBGRAPH via census-class
    // intersection — the reference module's namesake surface
    // (mcs.py:608-668 groups the SHARED subgraphs of a pair by edge
    // count and highlights the largest ones; the largest shared
    // canonical class IS its MCS approximation, exact up to the
    // census bound of 4 nodes). Same bounded pair selection and
    // one-shuffle census shape as B5; the pair map intersects two
    // molecule-sized class sets locally. The oracle re-derives the
    // same maxima from its brute-force canon-key census, so size/
    // edge/count/tiebreak all sit under the cross-engine hash.
    "g_mcs" -> { (s, d) =>
      import s.implicits._
      boundedPairs(s, d) { (okey, g) =>
        McsGraph(okey, Subgraphs.censusDetailed(g, CENSUS_MAX_SIZE)
          .map { case (h, sz, ck) => SubgraphClass(h, sz, ck) })
      }
        .map { case (a, b) =>
          val hb = b.classes.map(_.hash).toSet
          val shared = a.classes.filter(c => hb(c.hash))
          if (shared.isEmpty) McsRow(a.okey, b.okey, 0L, 0L, 0L, None)
          else {
            def edgesOf(c: SubgraphClass): Int = c.ck.split(':')(1).toInt
            val mcsSize = shared.map(_.size).max
            val atMax = shared.filter(_.size == mcsSize)
            val mcsEdges = atMax.map(edgesOf).max
            val pick = atMax.filter(edgesOf(_) == mcsEdges).map(_.ck).max
            McsRow(a.okey, b.okey, mcsSize.toLong, mcsEdges.toLong,
              atMax.size.toLong, Some(pick))
          }
        }
        .toDF()
    },

    // B8 (round-13): corpus-wide 3/4-node graphlet census over the
    // WHOLE widened edit graph — the global twin of B1's per-entity
    // census (Pržulj's graphlet spectrum as one readout per corpus,
    // not per molecule). Routed through [[Dispatch]]: the
    // class-structured blow-up answers via exact closed forms over
    // the (brand, size) class graph (members of a class share their
    // neighborhood, so every count collapses to bounded integer
    // sums — see [[GraphletCensus]]); an unstructured graph routes to
    // the distributed engine. The oracle re-derives the same closed
    // forms independently in SQL over the class table.
    "g_graphlets" -> { (s, d) =>
      Dispatch.graphlets(s, Dispatch.partVertices(s, d))
    },

    // B9 (round-14): graphlet SIGNIFICANCE — B8's observed census
    // against the Erdős–Rényi G(n, p) null model with the same vertex
    // and edge count (p = 2m / n(n−1)), the standard motif readout
    // (Milo 2002's significance profile, lift form): for a graphlet
    // with v vertices, e edges and automorphism group size a, the
    // expected non-induced count is (v!/a)·C(n,v)·p^e — closed form,
    // no sampling, so both engines compute it as the SAME IEEE
    // multiplication chain and the lifts hash bit-identically. n and
    // m come from the class-space quotient (one class-count groupBy
    // + one class-pair join — bounded by brand×size, corpus-free),
    // the same space the census itself rides.
    "g_graphlet_sig" -> { (s, d) =>
      import s.implicits._
      val obs = Dispatch.graphlets(s, Dispatch.partVertices(s, d))
      val cls = Dispatch.partVertices(s, d)
        .groupBy($"brand", $"size").agg(count(lit(1)).as("cn"))
      val stats = cls.agg(sum($"cn").cast("double").as("nv"))
        .crossJoin(
          cls.as("a").join(cls.as("b"),
              col("a.brand") === col("b.brand") &&
                abs(col("a.size") - col("b.size")).isin(1, 2))
            .agg(coalesce(sum(col("a.cn") * col("b.cn")), lit(0L))
              .cast("double").as("m2")))
      // (graphlet, v!/|Aut|, vertices, edges) — P3: a=2; K3: a=6;
      // K1,3: a=6; P4: a=2; tailed triangle: a=2; C4: a=8; diamond:
      // a=4; K4: a=24
      val look = Seq(
        ("wedge", 3.0, 3, 2), ("triangle", 1.0, 3, 3), ("claw", 4.0, 4, 3),
        ("path4", 12.0, 4, 3), ("tailed_triangle", 12.0, 4, 4),
        ("cycle4", 3.0, 4, 4), ("diamond", 6.0, 4, 5), ("clique4", 1.0, 4, 6))
        .toDF("graphlet", "coef", "vv", "ee")
      obs.join(broadcast(look), "graphlet").crossJoin(broadcast(stats))
        .withColumn("p", $"m2" / ($"nv" * ($"nv" - 1.0)))
        .withColumn("cnv",
          when($"vv" === 3, $"nv" * ($"nv" - 1.0) * ($"nv" - 2.0) / 6.0)
            .otherwise($"nv" * ($"nv" - 1.0) * ($"nv" - 2.0) * ($"nv" - 3.0) / 24.0))
        .withColumn("pk",
          when($"ee" === 2, $"p" * $"p")
            .when($"ee" === 3, $"p" * $"p" * $"p")
            .when($"ee" === 4, $"p" * $"p" * $"p" * $"p")
            .when($"ee" === 5, $"p" * $"p" * $"p" * $"p" * $"p")
            .otherwise($"p" * $"p" * $"p" * $"p" * $"p" * $"p"))
        .withColumn("expected", $"coef" * $"cnv" * $"pk")
        .select($"graphlet", $"n".as("observed"), $"expected",
          ($"n".cast("double") / $"expected").as("lift"))
    },

    // B5: pairwise Tanimoto + approx GED over a bounded order range
    // (mcs.py:285-346), ON THE HARD SIGNAL: shared-class counts,
    // Tanimoto and approx GED are raw IEEE ratios of integer class-set
    // cardinalities, which the oracle re-derives independently from
    // its brute-force canon-key census — bit-identical cross-engine,
    // no rounding. Exact GED (not SQL-expressible) rides as the
    // ged_ok guarantee boolean: |Δn| + |Δm| ≤ ged ≤ |Δn| + mₐ + m_b
    // (from ged = Δn + mₐ + m_b − 2·mapped with 0 ≤ mapped ≤
    // min(mₐ, m_b)), proven in-plan against Subgraphs.exactGed; the
    // raw GED value surface stays on Subgraphs.exactGed + specs.
    "g_ged_pairs" -> { (s, d) =>
      import s.implicits._
      boundedPairs(s, d) { (okey, g) =>
        val hashes = Subgraphs.census(g, CENSUS_MAX_SIZE).map(_._1)
        OrderGraph(okey, g.nodes, g.edges.toSeq.map(e => Seq(e._1, e._2)), hashes)
      }
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
          val (ma, mb) = (a.edges.size, b.edges.size)
          val exact =
            if (a.n == 0 || b.n == 0 || a.n > GED_EXACT_MAX_N || b.n > GED_EXACT_MAX_N) -1L
            else Subgraphs.exactGed(a.local, b.local).toLong
          val lower = math.abs(a.n - b.n) + math.abs(ma - mb)
          val upper = math.abs(a.n - b.n) + ma + mb
          GedRow(a.okey, b.okey, a.n.toLong, b.n.toLong, ma.toLong, mb.toLong,
            shared.toLong, tanimoto, approx,
            exact == -1L || (exact >= lower && exact <= upper))
        }
        .toDF()
    },
  )

  /** Brute-force census oracle CTE chain ending in
    * `cls(okey, ck)` — one row per (order, connected-iso-class) — and
    * `map(ck, h, sz)`, the canon-key → WL-hash dictionary.
    *
    * The oracle independently re-derives the per-order item graphs
    * (same supplier-share + adjacent-linenumber bonds), enumerates
    * EVERY node subset of size 2/3/4 by ordered self-joins, tests
    * connectivity arithmetically (size 3: m ≥ 2; size 4: m ≥ 4 or
    * m = 3 with no isolated vertex — the only 4-node 3-edge
    * disconnected shape is triangle+isolate), and classifies by
    * (size, m, sorted degree sequence), which is complete for
    * connected ≤ 4-node graphs. The 9 WL-hash literals in `map` are
    * the engine's hashes for the 9 classes, pinned by
    * SubgraphsSpec("canon-key → WL-hash dictionary"); everything the
    * census COMPUTES (enumeration, connectivity, dedup, counting) is
    * verified cross-engine, the dictionary is a fixed rename. */
  private val censusSql =
    """items AS (
      | SELECT CAST(l_orderkey AS BIGINT) AS okey, CAST(l_linenumber AS INT) AS node, l_suppkey AS supp
      | FROM lineitem),
      |valid AS (
      | -- mirrors Subgraphs.validate via buildGraph: size cap on
      | -- DISTINCT nodes, and rejection of any order where two items
      | -- share (node, supp) — that pair becomes a self-loop edge on
      | -- the Spark side and voids the whole order (B6)
      | SELECT okey FROM items GROUP BY okey
      | HAVING COUNT(DISTINCT node) <= 10
      |    AND COUNT(*) = COUNT(DISTINCT (node, supp))),
      |vitems AS (SELECT DISTINCT i.okey, i.node FROM items i JOIN valid v ON v.okey = i.okey),
      |e0 AS (
      | SELECT t.okey, t.a, t.b FROM (
      |  SELECT DISTINCT i1.okey, i1.node AS a, i2.node AS b
      |  FROM items i1 JOIN items i2
      |   ON i1.okey = i2.okey AND i1.supp = i2.supp AND i1.node < i2.node
      |  UNION
      |  SELECT DISTINCT i1.okey, i1.node, i2.node
      |  FROM items i1 JOIN items i2 ON i1.okey = i2.okey AND i2.node = i1.node + 1
      | ) t JOIN valid v ON v.okey = t.okey),
      |eo AS (SELECT okey, list([a, b]) AS es FROM e0 GROUP BY okey),
      |s2 AS (SELECT DISTINCT okey, '2:1:11' AS ck FROM e0),
      |t3 AS (
      | SELECT a.okey,
      |  (CASE WHEN list_contains(eo.es, [a.node, b.node]) THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(eo.es, [a.node, c.node]) THEN 1 ELSE 0 END
      |   + CASE WHEN list_contains(eo.es, [b.node, c.node]) THEN 1 ELSE 0 END) AS m
      | FROM vitems a
      |  JOIN vitems b ON b.okey = a.okey AND b.node > a.node
      |  JOIN vitems c ON c.okey = a.okey AND c.node > b.node
      |  JOIN eo ON eo.okey = a.okey),
      |s3 AS (
      | SELECT DISTINCT okey, CASE WHEN m = 3 THEN '3:3:222' ELSE '3:2:112' END AS ck
      | FROM t3 WHERE m >= 2),
      |t4 AS (
      | SELECT okey, e12+e13+e14+e23+e24+e34 AS m,
      |  e12+e13+e14 AS d1, e12+e23+e24 AS d2, e13+e23+e34 AS d3, e14+e24+e34 AS d4
      | FROM (
      |  SELECT a.okey,
      |   CASE WHEN list_contains(eo.es, [a.node, b.node]) THEN 1 ELSE 0 END AS e12,
      |   CASE WHEN list_contains(eo.es, [a.node, c.node]) THEN 1 ELSE 0 END AS e13,
      |   CASE WHEN list_contains(eo.es, [a.node, d.node]) THEN 1 ELSE 0 END AS e14,
      |   CASE WHEN list_contains(eo.es, [b.node, c.node]) THEN 1 ELSE 0 END AS e23,
      |   CASE WHEN list_contains(eo.es, [b.node, d.node]) THEN 1 ELSE 0 END AS e24,
      |   CASE WHEN list_contains(eo.es, [c.node, d.node]) THEN 1 ELSE 0 END AS e34
      |  FROM vitems a
      |   JOIN vitems b ON b.okey = a.okey AND b.node > a.node
      |   JOIN vitems c ON c.okey = a.okey AND c.node > b.node
      |   JOIN vitems d ON d.okey = a.okey AND d.node > c.node
      |   JOIN eo ON eo.okey = a.okey) q),
      |s4 AS (
      | SELECT DISTINCT okey,
      |  '4:' || m || ':' || array_to_string(list_sort([d1, d2, d3, d4]), '') AS ck
      | FROM t4
      | WHERE m >= 4 OR (m = 3 AND least(d1, d2, d3, d4) >= 1)),
      |cls AS (SELECT okey, ck FROM s2
      |        UNION ALL SELECT okey, ck FROM s3
      |        UNION ALL SELECT okey, ck FROM s4),
      |map AS (
      | SELECT * FROM (VALUES
      |  ('2:1:11',   'de4694dddcb9035ab2f53f563f9699bf', 2),
      |  ('3:2:112',  '51139270af9321b89635acca676c2177', 3),
      |  ('3:3:222',  'dee09eecea3a7f2063ef6a3a103855e3', 3),
      |  ('4:3:1122', '6d090fe3937b01e38819a7b5d4237ab1', 4),
      |  ('4:3:1113', '59bf232e1a78412f9c9b77315246ab6c', 4),
      |  ('4:4:1223', 'a32f0c85e825a65627d8df8f2d9a6003', 4),
      |  ('4:4:2222', '3e9feae938259890d2a4253469240227', 4),
      |  ('4:5:2233', 'eca5e60d4f0a1fe8cec33d62c710d1fb', 4),
      |  ('4:6:3333', '5688ca8e2136fda0029dee1dd3074496', 4)) m(ck, h, sz))""".stripMargin

  /** B8's oracle scaffold, split for reuse by B9: the class-space
    * quotient CTEs and the 8-row observed-count select. */
  private val graphletCtes: String =
    """cls AS (
        | SELECT p_brand AS brand, CAST(p_size AS BIGINT) AS size,
        |  CAST(COUNT(*) AS BIGINT) AS n
        | FROM part GROUP BY 1, 2),
        |adjp AS (
        | SELECT a.brand, a.size AS sa, b.size AS sb, a.n AS na, b.n AS nb
        | FROM cls a JOIN cls b
        |  ON a.brand = b.brand AND abs(a.size - b.size) IN (1, 2)),
        |degt AS (SELECT brand, sa AS size, CAST(SUM(nb) AS BIGINT) AS d
        |         FROM adjp GROUP BY 1, 2),
        |cd AS (SELECT c.brand, c.size, c.n, COALESCE(d.d, 0) AS d
        |       FROM cls c LEFT JOIN degt d USING (brand, size)),
        |tri AS (
        | SELECT a.brand, a.size AS s1, b.size AS s2, c.size AS s3,
        |        a.n AS n1, b.n AS n2, c.n AS n3
        | FROM cls a
        | JOIN cls b ON b.brand = a.brand AND b.size > a.size AND b.size - a.size IN (1, 2)
        | JOIN cls c ON c.brand = a.brand AND c.size > b.size
        |  AND c.size - b.size IN (1, 2) AND c.size - a.size IN (1, 2)),
        |trin AS (SELECT CAST(COALESCE(SUM(n1 * n2 * n3), 0) AS BIGINT) AS v FROM tri),
        |cedge AS (SELECT brand, sa, sb, na, nb FROM adjp WHERE sa < sb),
        |spair AS (
        | SELECT x.brand, x.size AS sa, y.size AS sb, CAST(SUM(c.n) AS BIGINT) AS s
        | FROM cls x
        | JOIN cls y ON y.brand = x.brand AND x.size <= y.size
        | JOIN cls c ON c.brand = x.brand
        |  AND abs(c.size - x.size) IN (1, 2) AND abs(c.size - y.size) IN (1, 2)
        | GROUP BY 1, 2, 3),
        |quad AS (
        | SELECT a.n AS n1, b.n AS n2, c.n AS n3, d.n AS n4
        | FROM cls a
        | JOIN cls b ON b.brand = a.brand AND b.size > a.size AND b.size - a.size IN (1, 2)
        | JOIN cls c ON c.brand = a.brand AND c.size > b.size
        |  AND c.size - b.size IN (1, 2) AND c.size - a.size IN (1, 2)
        | JOIN cls d ON d.brand = a.brand AND d.size > c.size
        |  AND d.size - c.size IN (1, 2) AND d.size - b.size IN (1, 2)
        |  AND d.size - a.size IN (1, 2))""".stripMargin

  private val graphletObsSql: String =
    """|SELECT 'wedge' AS graphlet,
        | CAST(COALESCE((SELECT SUM(n * (d * (d - 1) // 2)) FROM cd), 0) AS BIGINT) AS n
        |UNION ALL SELECT 'triangle', (SELECT v FROM trin)
        |UNION ALL SELECT 'claw',
        | CAST(COALESCE((SELECT SUM(n * (d * (d - 1) * (d - 2) // 6)) FROM cd), 0) AS BIGINT)
        |UNION ALL SELECT 'path4',
        | CAST(COALESCE((SELECT SUM(e.na * e.nb * (da.d - 1) * (db.d - 1))
        |  FROM cedge e
        |  JOIN cd da ON da.brand = e.brand AND da.size = e.sa
        |  JOIN cd db ON db.brand = e.brand AND db.size = e.sb), 0) AS BIGINT)
        |  - 3 * (SELECT v FROM trin)
        |UNION ALL SELECT 'tailed_triangle',
        | CAST(COALESCE((SELECT SUM(t.n1 * t.n2 * t.n3 * (d1.d + d2.d + d3.d - 6))
        |  FROM tri t
        |  JOIN cd d1 ON d1.brand = t.brand AND d1.size = t.s1
        |  JOIN cd d2 ON d2.brand = t.brand AND d2.size = t.s2
        |  JOIN cd d3 ON d3.brand = t.brand AND d3.size = t.s3), 0) AS BIGINT)
        |UNION ALL SELECT 'cycle4',
        | CAST(COALESCE((SELECT SUM(
        |    (CASE WHEN p.sa = p.sb THEN x.n * (x.n - 1) // 2 ELSE x.n * y.n END)
        |    * (p.s * (p.s - 1) // 2))
        |  FROM spair p
        |  JOIN cls x ON x.brand = p.brand AND x.size = p.sa
        |  JOIN cls y ON y.brand = p.brand AND y.size = p.sb), 0) // 2 AS BIGINT)
        |UNION ALL SELECT 'diamond',
        | CAST(COALESCE((SELECT SUM(e.na * e.nb * (s.s * (s.s - 1) // 2))
        |  FROM cedge e
        |  JOIN spair s ON s.brand = e.brand AND s.sa = e.sa AND s.sb = e.sb), 0) AS BIGINT)
        |UNION ALL SELECT 'clique4',
        | CAST(COALESCE((SELECT SUM(n1 * n2 * n3 * n4) FROM quad), 0) AS BIGINT)""".stripMargin

  override def oracles: Map[String, String] = Map(
    // B6: validation verdicts recomputed arithmetically — the size
    // cap runs on DISTINCT nodes (validate() dedups first), a
    // duplicate (node, supp) pair is exactly the condition under
    // which the Spark side derives a self-loop edge, and the check
    // ORDER mirrors validate() (size cap before self-loop). Edge
    // counts re-derive the supplier-share + adjacency bonds over the
    // distinct node set with UNION dedup = the canonical edge Set.
    "g_validation" ->
      """WITH items AS (
        | SELECT CAST(l_orderkey AS BIGINT) AS okey, CAST(l_linenumber AS INT) AS node, l_suppkey AS supp
        | FROM lineitem),
        |agg AS (
        | SELECT okey, COUNT(DISTINCT node) AS nd, COUNT(*) AS cnt,
        |  COUNT(DISTINCT (node, supp)) AS cnp
        | FROM items GROUP BY okey),
        |verdict AS (
        | SELECT okey,
        |  CASE WHEN nd > 10 THEN 'too many nodes: ' || CAST(nd AS VARCHAR) || ' > 10'
        |       WHEN cnt > cnp THEN 'self-loop' END AS reject_reason,
        |  nd
        | FROM agg),
        |e0 AS (
        | SELECT DISTINCT i1.okey, i1.node AS a, i2.node AS b
        | FROM items i1 JOIN items i2
        |  ON i1.okey = i2.okey AND i1.supp = i2.supp AND i1.node < i2.node
        | UNION
        | SELECT DISTINCT i1.okey, i1.node, i2.node
        | FROM items i1 JOIN items i2 ON i1.okey = i2.okey AND i2.node = i1.node + 1),
        |ecnt AS (SELECT okey, CAST(COUNT(*) AS BIGINT) AS m FROM e0 GROUP BY okey)
        |SELECT v.okey AS o_orderkey, v.reject_reason IS NULL AS is_valid,
        | v.reject_reason,
        | CASE WHEN v.reject_reason IS NULL THEN CAST(v.nd AS BIGINT) END AS n_nodes,
        | CASE WHEN v.reject_reason IS NULL THEN COALESCE(e.m, 0) END AS n_edges
        |FROM verdict v LEFT JOIN ecnt e ON e.okey = v.okey""".stripMargin,
    "g_subgraph_census" ->
      s"""WITH $censusSql
         |SELECT c.okey AS o_orderkey, m.h AS subgraph_hash,
         | CAST(m.sz AS BIGINT) AS size, c.ck AS canon_key
         |FROM cls c JOIN map m ON m.ck = c.ck""".stripMargin,
    "g_subgraph_index" ->
      s"""WITH $censusSql
         |SELECT m.h AS subgraph_hash, CAST(m.sz AS BIGINT) AS size,
         | CAST(COUNT(*) AS BIGINT) AS frequency, c.ck AS canon_key
         |FROM cls c JOIN map m ON m.ck = c.ck
         |GROUP BY m.h, m.sz, c.ck""".stripMargin,
    "g_subgraph_by_size" ->
      s"""WITH $censusSql
         |SELECT m.h AS subgraph_hash, CAST(COUNT(*) AS BIGINT) AS frequency,
         | c.ck AS canon_key
         |FROM cls c JOIN map m ON m.ck = c.ck
         |WHERE m.sz = 3
         |GROUP BY m.h, c.ck""".stripMargin,
    // B8: the closed forms re-derived independently over the class
    // table (deg/S_ab/triple/quadruple sums — integer-exact, so the
    // eight counts hash-match with no quantization protocol). Integer
    // division only where the dividend is provably divisible (C(x,2),
    // C(x,3) products of consecutive integers; the cycle4 total
    // counts every 4-cycle twice).
    "g_graphlets" -> s"WITH $graphletCtes\n$graphletObsSql",
    // B9: same observed CTEs, then the closed-form ER expectation as
    // the IDENTICAL multiplication chain the engine builds (left-
    // associative, doubles throughout) — lift hashes bit for bit.
    "g_graphlet_sig" ->
      s"""WITH $graphletCtes,
         |obs AS ($graphletObsSql),
         |nv_ AS (SELECT CAST(SUM(n) AS DOUBLE) AS nv FROM cls),
         |m2_ AS (SELECT CAST(COALESCE(SUM(na * nb), 0) AS DOUBLE) AS m2 FROM adjp),
         |p_ AS (SELECT m2 / (nv * (nv - 1.0)) AS p FROM nv_, m2_),
         |look(graphlet, coef, vv, ee) AS (VALUES
         |  ('wedge', 3.0, 3, 2), ('triangle', 1.0, 3, 3), ('claw', 4.0, 4, 3),
         |  ('path4', 12.0, 4, 3), ('tailed_triangle', 12.0, 4, 4),
         |  ('cycle4', 3.0, 4, 4), ('diamond', 6.0, 4, 5), ('clique4', 1.0, 4, 6)),
         |scored AS (
         | SELECT o.graphlet, o.n AS observed,
         |  CAST(l.coef AS DOUBLE)
         |   * (CASE WHEN l.vv = 3 THEN s.nv * (s.nv - 1.0) * (s.nv - 2.0) / 6.0
         |           ELSE s.nv * (s.nv - 1.0) * (s.nv - 2.0) * (s.nv - 3.0) / 24.0 END)
         |   * (CASE l.ee WHEN 2 THEN p.p * p.p
         |                WHEN 3 THEN p.p * p.p * p.p
         |                WHEN 4 THEN p.p * p.p * p.p * p.p
         |                WHEN 5 THEN p.p * p.p * p.p * p.p * p.p
         |                ELSE p.p * p.p * p.p * p.p * p.p * p.p END) AS expected
         | FROM obs o JOIN look l USING (graphlet), nv_ s, p_ p)
         |SELECT graphlet, observed, expected,
         | CAST(observed AS DOUBLE) / expected AS lift
         |FROM scored""".stripMargin,
    // B7: the MCS maxima re-derived from the same brute-force census.
    // The engine intersects WL-hash sets, the oracle canon-key sets —
    // the 9-entry dictionary is bijective (spec-pinned), so the
    // intersections agree; size/edges parse out of the canon key
    // itself ("size:m:degseq") and the lexicographic tiebreak is over
    // ASCII digit strings with identical (size, m) prefixes — stable
    // in both engines.
    "g_mcs" ->
      s"""WITH $censusSql,
         |sel AS (SELECT okey FROM valid WHERE okey < $GED_KEY_BOUND),
         |cs AS (SELECT c.okey, c.ck FROM cls c JOIN sel USING (okey)),
         |shared AS (
         | SELECT x.okey AS oa, y.okey AS ob, x.ck,
         |        CAST(split_part(x.ck, ':', 1) AS BIGINT) AS sz,
         |        CAST(split_part(x.ck, ':', 2) AS BIGINT) AS m
         | FROM cs x JOIN cs y ON x.ck = y.ck AND x.okey < y.okey),
         |agg AS (SELECT oa, ob, MAX(sz) AS mcs_size FROM shared GROUP BY oa, ob),
         |atmax AS (
         | SELECT s.oa, s.ob, MAX(s.m) AS mcs_edges,
         |        CAST(COUNT(*) AS BIGINT) AS n_shared_at_max
         | FROM shared s JOIN agg g ON g.oa = s.oa AND g.ob = s.ob AND s.sz = g.mcs_size
         | GROUP BY s.oa, s.ob),
         |pick AS (
         | SELECT s.oa, s.ob, MAX(s.ck) AS mcs_canon_key
         | FROM shared s
         |  JOIN agg g ON g.oa = s.oa AND g.ob = s.ob AND s.sz = g.mcs_size
         |  JOIN atmax t ON t.oa = s.oa AND t.ob = s.ob AND s.m = t.mcs_edges
         | GROUP BY s.oa, s.ob)
         |SELECT a.okey AS order_a, b.okey AS order_b,
         | COALESCE(g.mcs_size, 0) AS mcs_size,
         | COALESCE(t.mcs_edges, 0) AS mcs_edges,
         | COALESCE(t.n_shared_at_max, 0) AS n_shared_at_max,
         | p.mcs_canon_key
         |FROM sel a JOIN sel b ON a.okey < b.okey
         | LEFT JOIN agg g ON g.oa = a.okey AND g.ob = b.okey
         | LEFT JOIN atmax t ON t.oa = a.okey AND t.ob = b.okey
         | LEFT JOIN pick p ON p.oa = a.okey AND p.ob = b.okey""".stripMargin,
    // B5: the pairwise surface re-derived from the SAME brute-force
    // census — class-set cardinalities are engine-independent
    // integers, the ratios are single IEEE ops in a fixed order, and
    // ged_ok is the guarantee literal (see the query comment).
    "g_ged_pairs" ->
      s"""WITH $censusSql,
         |sel AS (SELECT okey FROM valid WHERE okey < $GED_KEY_BOUND),
         |nn AS (SELECT v.okey, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM vitems v JOIN sel USING (okey) GROUP BY v.okey),
         |mm AS (SELECT e.okey, CAST(COUNT(*) AS BIGINT) AS m
         |       FROM e0 e JOIN sel USING (okey) GROUP BY e.okey),
         |cs AS (SELECT c.okey, c.ck FROM cls c JOIN sel USING (okey)),
         |nh AS (SELECT okey, CAST(COUNT(*) AS BIGINT) AS nh FROM cs GROUP BY okey),
         |shared AS (SELECT x.okey AS oa, y.okey AS ob, CAST(COUNT(*) AS BIGINT) AS sh
         |           FROM cs x JOIN cs y ON x.ck = y.ck AND x.okey < y.okey
         |           GROUP BY x.okey, y.okey)
         |SELECT a.okey AS order_a, b.okey AS order_b,
         | na.n AS n_nodes_a, nb.n AS n_nodes_b,
         | COALESCE(ma.m, 0) AS n_edges_a, COALESCE(mb.m, 0) AS n_edges_b,
         | COALESCE(s.sh, 0) AS shared_subgraphs,
         | CASE WHEN COALESCE(ha.nh, 0) + COALESCE(hb.nh, 0) - COALESCE(s.sh, 0) = 0 THEN 0.0
         |  ELSE CAST(COALESCE(s.sh, 0) AS DOUBLE)
         |   / CAST(COALESCE(ha.nh, 0) + COALESCE(hb.nh, 0) - COALESCE(s.sh, 0) AS DOUBLE)
         | END AS tanimoto,
         | CASE WHEN LEAST(COALESCE(ha.nh, 0), COALESCE(hb.nh, 0)) = 0
         |  THEN CAST(GREATEST(na.n, nb.n) AS DOUBLE)
         |  ELSE CAST(GREATEST(na.n, nb.n) AS DOUBLE)
         |   * (1.0 - CAST(COALESCE(s.sh, 0) AS DOUBLE)
         |      / CAST(LEAST(ha.nh, hb.nh) AS DOUBLE))
         | END AS approx_ged,
         | TRUE AS ged_ok
         |FROM sel a JOIN sel b ON a.okey < b.okey
         | JOIN nn na ON na.okey = a.okey JOIN nn nb ON nb.okey = b.okey
         | LEFT JOIN mm ma ON ma.okey = a.okey LEFT JOIN mm mb ON mb.okey = b.okey
         | LEFT JOIN nh ha ON ha.okey = a.okey LEFT JOIN nh hb ON hb.okey = b.okey
         | LEFT JOIN shared s ON s.oa = a.okey AND s.ob = b.okey""".stripMargin,
  )
}
