package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-wide 3/4-node graphlet census (SURVEY §2 B8, round-13) —
  * the classic graph-mining readout (Pržulj 2004's graphlet spectrum;
  * the ESCAPE/PGD counting literature) over the WHOLE edit graph,
  * complementing B1's per-entity census of bounded orders. Eight
  * NON-INDUCED pattern counts, each an exact BIGINT:
  *
  *   wedge           Σ_v C(d_v, 2)           (2-paths)
  *   triangle        closed triples
  *   claw            Σ_v C(d_v, 3)           (3-stars)
  *   path4           Σ_{uv∈E} (d_u−1)(d_v−1) − 3·triangle
  *   tailed_triangle Σ_Δ (d_a + d_b + d_c − 6)
  *   cycle4          ½ Σ_{u≠w} C(codeg(u, w), 2)
  *   diamond         Σ_{uv∈E} C(tri_uv, 2)   (triangle pairs sharing an edge)
  *   clique4         K4 subgraphs
  *
  * (sums over vertices / edges / triangles Δ / unordered vertex pairs;
  * tri_uv = triangles through edge uv, codeg = common-neighbor count.
  * Triangle and clique4 coincide with their induced counts; the rest
  * are the standard non-induced totals the formula literature counts,
  * from which induced spectra are a linear transform.)
  *
  * Scale shape — the quotient discipline ([[Dispatch]]): on the
  * class-structured edit graph every count has a CLOSED FORM over the
  * dimension-bounded (brand, size) class graph (members of one class
  * share their whole neighborhood, and classes are independent sets —
  * no intra-class edges — so e.g. codeg(u, w) depends only on the
  * classes of u and w). One bounded class probe, in-process integer
  * arithmetic over ≤ |classes|² pairs (+ triple/quadruple walks of
  * each brand's size ladder), zero fact-scale work. An unstructured
  * graph routes to the distributed engine: degree aggregates for the
  * degree-only formulas, [[KTruss.triangles]]'s degree-ordered
  * enumeration for the triangle family, a wedge-endpoint groupBy for
  * cycle4 — the one genuinely Σ C(d,2)-sized shuffle, which is the
  * known cost floor of exact 4-cycle counting on arbitrary graphs
  * (the quotient route exists precisely so the blow-up never pays
  * it). Counts are exact BIGINTs; at corpora where a count would
  * exceed 2⁶³ the readout itself is out of integer range — callers
  * wanting spectra at that scale sample first.
  */
object GraphletCensus {

  /** Output order (display only — the oracle compare sorts rows). */
  private val NAMES = Seq("wedge", "triangle", "claw", "path4",
    "tailed_triangle", "cycle4", "diamond", "clique4")

  private def c2(x: Long): Long = x * (x - 1) / 2
  private def c3(x: Long): Long = x * (x - 1) * (x - 2) / 6

  /** Closed-form census over a probed class map under the symmetric
    * same-brand size-delta edit rule. Pure integer arithmetic —
    * bit-identical to [[distributed]] on the blow-up by construction
    * (DispatchSpec pins it). */
  def quotientCounts(classes: Map[(String, Long), Long],
                     deltas: Seq[Long] = Seq(1L, 2L)): Seq[(String, Long)] = {
    val ds = deltas.flatMap(d => Seq(d, -d)).distinct
    def n(c: (String, Long)): Long = classes(c)
    val keys = classes.keys.toSeq
    def nbrs(c: (String, Long)): Seq[(String, Long)] =
      ds.map(d => (c._1, c._2 + d)).filter(classes.contains)
    val deg: Map[(String, Long), Long] = keys.map(c => c -> nbrs(c).map(n).sum).toMap
    def adj(a: (String, Long), b: (String, Long)): Boolean =
      a._1 == b._1 && deltas.contains(math.abs(a._2 - b._2))
    /** Common-neighbor pool size of a vertex in `a` and one in `b`. */
    def s2(a: (String, Long), b: (String, Long)): Long =
      nbrs(a).filter(c => adj(c, b)).map(n).sum
    val byBrand = keys.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq)
    val wedge = keys.map(c => n(c) * c2(deg(c))).sum
    val claw = keys.map(c => n(c) * c3(deg(c))).sum
    // unordered class edges / pairwise-adjacent triples & quadruples:
    // walked per brand over the sorted size ladder (|sizes| ≤ the
    // attribute domain, so the quadruple loop is bounded)
    val edges = byBrand.toSeq.flatMap { case (b, ss) =>
      for (i <- ss.indices; j <- (i + 1) until ss.length
           if deltas.contains(ss(j) - ss(i))) yield ((b, ss(i)), (b, ss(j)))
    }
    val triples = byBrand.toSeq.flatMap { case (b, ss) =>
      for {
        i <- ss.indices; j <- (i + 1) until ss.length
        if deltas.contains(ss(j) - ss(i))
        k <- (j + 1) until ss.length
        if deltas.contains(ss(k) - ss(j)) && deltas.contains(ss(k) - ss(i))
      } yield ((b, ss(i)), (b, ss(j)), (b, ss(k)))
    }
    val quads = byBrand.toSeq.flatMap { case (b, ss) =>
      for {
        i <- ss.indices; j <- (i + 1) until ss.length
        if deltas.contains(ss(j) - ss(i))
        k <- (j + 1) until ss.length
        if deltas.contains(ss(k) - ss(j)) && deltas.contains(ss(k) - ss(i))
        l <- (k + 1) until ss.length
        if deltas.contains(ss(l) - ss(k)) && deltas.contains(ss(l) - ss(j)) &&
          deltas.contains(ss(l) - ss(i))
      } yield ((b, ss(i)), (b, ss(j)), (b, ss(k)), (b, ss(l)))
    }
    val triangle = triples.map { case (a, b, c) => n(a) * n(b) * n(c) }.sum
    val tailed = triples.map { case (a, b, c) =>
      n(a) * n(b) * n(c) * (deg(a) + deg(b) + deg(c) - 6) }.sum
    val path4 = edges.map { case (a, b) =>
      n(a) * n(b) * (deg(a) - 1) * (deg(b) - 1) }.sum - 3 * triangle
    val diamond = edges.map { case (a, b) => n(a) * n(b) * c2(s2(a, b)) }.sum
    // every unordered VERTEX pair maps to an ordered-size class pair
    // (same class ⇒ C(n,2) pairs); the double-count of each 4-cycle
    // by its two diagonals divides out at the end
    val cycle4 = byBrand.toSeq.map { case (b, ss) =>
      (for (i <- ss.indices; j <- i until ss.length) yield {
        val (a, bb) = ((b, ss(i)), (b, ss(j)))
        val pairs = if (i == j) c2(n(a)) else n(a) * n(bb)
        pairs * c2(s2(a, bb))
      }).sum
    }.sum / 2
    val clique4 = quads.map { case (a, b, c, d) => n(a) * n(b) * n(c) * n(d) }.sum
    NAMES.zip(Seq(wedge, triangle, claw, path4, tailed, cycle4, diamond, clique4))
  }

  /** General engine over any (src, dst) edge set (symmetric or not —
    * canonicalized here; self-loops dropped). */
  def distributed(s: SparkSession, edges: DataFrame): DataFrame = {
    import s.implicits._
    val canon = edges
      .select(least(col("src"), col("dst")).cast("long").as("a"),
        greatest(col("src"), col("dst")).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull)
      .distinct()
      .localCheckpoint(false) // five consumers below
    val sym = canon.union(canon.select($"b".as("a"), $"a".as("b")))
    val deg = sym.groupBy($"a".as("nd")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(false)
    def scalar(df: DataFrame): Long = {
      val r = df.head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val wedge = scalar(deg.agg(sum(expr("deg * (deg - 1) DIV 2"))))
    val claw = scalar(deg.agg(sum(expr("deg * (deg - 1) * (deg - 2) DIV 6"))))
    val tri = KTruss.triangles(s, canon).localCheckpoint(false) // four consumers
    val triangle = tri.count()
    val degX = deg.select($"nd", $"deg")
    val tailed = scalar(tri
      .join(degX.select($"nd".as("x"), $"deg".as("dx")), "x")
      .join(degX.select($"nd".as("y"), $"deg".as("dy")), "y")
      .join(degX.select($"nd".as("z"), $"deg".as("dz")), "z")
      .agg(sum($"dx" + $"dy" + $"dz" - 6)))
    val path4 = scalar(canon
      .join(degX.select($"nd".as("a"), $"deg".as("da")), "a")
      .join(degX.select($"nd".as("b"), $"deg".as("db")), "b")
      .agg(sum(($"da" - 1) * ($"db" - 1)))) - 3 * triangle
    // per-edge triangle incidence → diamonds
    val triE = tri.select(explode(array(
        struct($"x".as("ea"), $"y".as("eb")),
        struct($"x".as("ea"), $"z".as("eb")),
        struct($"y".as("ea"), $"z".as("eb")))).as("e"))
      .select($"e.ea", $"e.eb")
      .groupBy($"ea", $"eb").agg(count(lit(1)).as("t"))
    val diamond = scalar(triE.agg(sum(expr("t * (t - 1) DIV 2"))))
    // codegree of every unordered endpoint pair: the wedge-endpoint
    // groupBy — the Σ C(d,2)-sized shuffle (see class doc)
    val codeg = sym.as("e1").join(sym.as("e2"),
        col("e1.a") === col("e2.a") && col("e1.b") < col("e2.b"))
      .select(col("e1.b").as("u"), col("e2.b").as("w"))
      .groupBy($"u", $"w").agg(count(lit(1)).as("cd"))
    val cycle4 = scalar(codeg.agg(sum(expr("cd * (cd - 1) DIV 2")))) / 2
    val clique4 = tri
      .join(canon.select($"a".as("x"), $"b".as("d")), Seq("x"))
      .filter($"d" > $"z")
      .join(canon.select($"a".as("y"), $"b".as("d")), Seq("y", "d"), "left_semi")
      .join(canon.select($"a".as("z"), $"b".as("d")), Seq("z", "d"), "left_semi")
      .count()
    toDF(s, NAMES.zip(Seq(wedge, triangle, claw, path4, tailed, cycle4, diamond, clique4)))
  }

  def toDF(s: SparkSession, counts: Seq[(String, Long)]): DataFrame = {
    import s.implicits._
    counts.toDF("graphlet", "n")
  }
}
