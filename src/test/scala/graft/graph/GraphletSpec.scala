package graft.graph

import graft.SparkSpec

/** B8 (round-13): the corpus-wide graphlet census — the distributed
  * engine pinned against textbook closed forms on graphs whose
  * spectra are known exactly, and the key's quotient route pinned
  * against a brute-force subgraph enumeration on the shipped data's
  * class structure. */
class GraphletSpec extends SparkSpec {

  private def counts(edges: Seq[(Long, Long)]): Map[String, Long] = {
    import spark.implicits._
    GraphletCensus.distributed(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("distributed engine: textbook spectra on K4, P4, C4, the 4-star and the triangle+tail") {
    // complete graph K4
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(k4) === Map("wedge" -> 12L, "triangle" -> 4L, "claw" -> 4L,
      "path4" -> 12L, "tailed_triangle" -> 12L, "cycle4" -> 3L,
      "diamond" -> 6L, "clique4" -> 1L))
    // path 1-2-3-4
    val p4 = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(counts(p4) === Map("wedge" -> 2L, "triangle" -> 0L, "claw" -> 0L,
      "path4" -> 1L, "tailed_triangle" -> 0L, "cycle4" -> 0L,
      "diamond" -> 0L, "clique4" -> 0L))
    // 4-cycle
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(counts(c4) === Map("wedge" -> 4L, "triangle" -> 0L, "claw" -> 0L,
      "path4" -> 4L, "tailed_triangle" -> 0L, "cycle4" -> 1L,
      "diamond" -> 0L, "clique4" -> 0L))
    // star: hub 0 with 4 leaves
    val s4 = (1L to 4L).map(i => (0L, i))
    assert(counts(s4) === Map("wedge" -> 6L, "triangle" -> 0L, "claw" -> 4L,
      "path4" -> 0L, "tailed_triangle" -> 0L, "cycle4" -> 0L,
      "diamond" -> 0L, "clique4" -> 0L))
    // triangle 1-2-3 with tail 3-4
    val tt = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(counts(tt) === Map("wedge" -> 5L, "triangle" -> 1L, "claw" -> 1L,
      "path4" -> 2L, "tailed_triangle" -> 1L, "cycle4" -> 0L,
      "diamond" -> 0L, "clique4" -> 0L))
  }

  test("distributed engine: input normalization — direction, duplicates, self-loops, nulls") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val messy = tri ++ tri.map(_.swap) ++ tri ++ Seq((2L, 2L))
    assert(counts(messy) === counts(tri))
    assert(counts(Seq.empty).values.forall(_ === 0L))
  }

  test("quotient closed form: brute-force agreement on a random class blow-up") {
    // a hand-rolled class map; the blow-up is small enough to count
    // every pattern by brute force over vertex subsets
    val classes = Map(("A", 1L) -> 2L, ("A", 2L) -> 3L, ("A", 3L) -> 1L,
      ("A", 5L) -> 2L, ("B", 7L) -> 2L, ("B", 8L) -> 2L)
    val got = GraphletCensus.quotientCounts(classes).toMap
    // materialize the blow-up
    var id = 0L
    val nodes = classes.toSeq.sortBy(_._1).flatMap { case ((b, s), n) =>
      (1L to n).map { _ => id += 1; (id, b, s) }
    }
    val edges = for {
      (u, b1, s1) <- nodes; (v, b2, s2) <- nodes
      if u < v && b1 == b2 && math.abs(s1 - s2) >= 1 && math.abs(s1 - s2) <= 2
    } yield (u, v)
    val adj = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty[Long])
    val ids = nodes.map(_._1)
    def c2(x: Long) = x * (x - 1) / 2
    def c3(x: Long) = x * (x - 1) * (x - 2) / 6
    val deg = ids.map(v => v -> adj(v).size.toLong).toMap
    val wedge = ids.map(v => c2(deg(v))).sum
    val claw = ids.map(v => c3(deg(v))).sum
    val tris = for {
      a <- ids; b <- ids if a < b && adj(a)(b)
      c <- ids if b < c && adj(a)(c) && adj(b)(c)
    } yield (a, b, c)
    val path4 = edges.map { case (u, v) => (deg(u) - 1) * (deg(v) - 1) }.sum -
      3 * tris.size
    val tailed = tris.map { case (a, b, c) => deg(a) + deg(b) + deg(c) - 6 }.sum
    val cycle4 = (for (u <- ids; w <- ids if u < w)
      yield c2((adj(u) & adj(w)).size.toLong)).sum / 2
    val diamond = edges.map { case (u, v) => c2((adj(u) & adj(v)).size.toLong) }.sum
    val clique4 = (for {
      (a, b, c) <- tris; d <- ids
      if d > c && adj(a)(d) && adj(b)(d) && adj(c)(d)
    } yield 1L).sum
    assert(got === Map("wedge" -> wedge, "triangle" -> tris.size.toLong,
      "claw" -> claw, "path4" -> path4, "tailed_triangle" -> tailed,
      "cycle4" -> cycle4, "diamond" -> diamond, "clique4" -> clique4))
    // sanity: this shape actually exercises the 4-node patterns
    assert(tris.nonEmpty && cycle4 > 0 && diamond > 0)
  }

  test("g_graphlets key: shipped route is the quotient closed form and every count is consistent") {
    val out = graft.SparkEntry.queries("g_graphlets")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set("wedge", "triangle", "claw", "path4",
      "tailed_triangle", "cycle4", "diamond", "clique4"))
    assert(out.values.forall(_ >= 0L))
    // the size-ladder edit rule spans ≤ 2, so 4 pairwise-adjacent
    // distinct sizes cannot exist: clique4 = 0 is structural
    assert(out("clique4") === 0L)
    // the widened ladder is triangle-rich (s, s+1, s+2 triples)
    assert(out("triangle") > 0L && out("wedge") > out("triangle"))
  }
  test("g_graphlet_sig (B9): lifts reconcile with an independent ER-null recomputation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sig = SubgraphPack.queries("g_graphlet_sig")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(sig.keySet === Set("wedge", "triangle", "claw", "path4",
      "tailed_triangle", "cycle4", "diamond", "clique4"))
    // independent n / m / observed recomputation from the raw tables,
    // then the SAME closed form evaluated in plain Scala doubles
    val parts = Dispatch.partVertices(spark, sfDir)
    val nv = parts.count().toDouble
    val m2 = GraphBuilder.blowupEdges(parts, Seq(1L, 2L), symmetric = true)
      .count().toDouble // symmetric store: ordered pair count = 2m
    val p = m2 / (nv * (nv - 1.0))
    val obs = Dispatch.graphlets(spark, parts)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val spec = Map(
      "wedge" -> ((3.0, 3, 2)), "triangle" -> ((1.0, 3, 3)),
      "claw" -> ((4.0, 4, 3)), "path4" -> ((12.0, 4, 3)),
      "tailed_triangle" -> ((12.0, 4, 4)), "cycle4" -> ((3.0, 4, 4)),
      "diamond" -> ((6.0, 4, 5)), "clique4" -> ((1.0, 4, 6)))
    spec.foreach { case (g, (coef, v, e)) =>
      val cnv =
        if (v == 3) nv * (nv - 1.0) * (nv - 2.0) / 6.0
        else nv * (nv - 1.0) * (nv - 2.0) * (nv - 3.0) / 24.0
      val pk = (1 to e).map(_ => p).product // left-assoc chain, same order
      val expected = coef * cnv * pk
      val (gotObs, gotExp, gotLift) = sig(g)
      assert(gotObs === obs(g), s"$g observed")
      assert(gotExp === expected, s"$g expected (bit-exact chain)")
      assert(gotLift === gotObs.toDouble / expected, s"$g lift")
    }
    // the part graph is brand-banded, i.e. heavily clustered: closed
    // shapes must be enriched against the ER null (clique4 only when
    // the tiny spec SF has any K4 at all)
    assert(sig("triangle")._3 > 1.0)
    if (sig("clique4")._1 > 0L) assert(sig("clique4")._3 > 1.0)
  }
}
