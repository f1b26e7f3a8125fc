package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: the Luby-MIS quotient fast path (A29) and the
  * real image-header decoder branch (G2). */
class RoundEightOpsSpec extends SparkSpec {

  test("MIS: the quotient fast path is identical to the edge-set Luby loop (mis_round included)") {
    import spark.implicits._
    // bit-identity on BOTH shipped scales — the whole (node, in_mis,
    // mis_round) row set, not just the member set: the quotient path
    // must replay every round, not merely land on some valid MIS
    def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Boolean, Option[Long])] =
      df.collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dist = asSet(graph.Mis.run(spark,
        Tables.part(spark, d).select($"p_partkey".as("id")),
        graph.GraphBuilder.partEdgesWide(spark, d)))
      val fast = asSet(graph.Mis.quotientPartEdit(spark, d))
      assert(fast === dist, s"quotient diverges from the edge-set loop at $d")
      // non-vacuous: a real MIS on this graph has members AND
      // non-members, and takes more than one round
      assert(fast.exists(_._2) && fast.exists(!_._2), s"degenerate MIS at $d")
      assert(fast.flatMap(_._3).max > 1L, s"single-round MIS at $d — dynamics unexercised")
    }
  }

  test("node-Jaccard: the quotient stamp is identical to the positional-block engine") {
    def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val dist = asSet(graph.NodeSimilarity.jaccard(spark,
        graph.GraphBuilder.partEdgesWide(spark, d)))
      val fast = asSet(graph.NodeSimilarity.jaccardQuotientPartEdit(spark, d))
      assert(fast === dist, s"quotient diverges from the block engine at $d")
      assert(fast.exists(_._4 < 1.0) && fast.exists(_._4 == 1.0),
        s"degenerate Jaccard spectrum at $d — equivalence under-exercised")
    }
  }

  test("PPR: the refined quotient is identical to the distributed loop") {
    import spark.implicits._
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val seeds = Tables.part(spark, d).filter($"p_partkey" % 100 === 0)
        .select($"p_partkey".as("node"))
      val dist = asMap(graph.PersonalizedPageRank.run(spark,
        graph.GraphBuilder.partEdges(spark, d), seeds, 6))
      val fast = asMap(graph.PersonalizedPageRank.quotientPartEdit(spark, d, 6))
      assert(fast.keySet === dist.keySet, s"node sets diverge at $d")
      fast.foreach { case (n, r) => assert(dist(n) === r, s"rank of $n at $d") }
      // non-vacuity lives at sf0.01: at sf0.001 no seed class touches
      // an edge (45 sources, all ranks exactly 0 on BOTH paths — the
      // data, not the engines), so the rich-spectrum check there
      // would assert on the corpus, not the code
      if (d.endsWith("sf0.01"))
        assert(fast.values.toSet.size > 100 && fast.values.exists(_ > 0),
          s"degenerate rank spectrum at $d")
    }
  }

  test("ANF: the class-ball quotient is identical to propagation + exact wedge ball") {
    import spark.implicits._
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = graph.GraphBuilder.partEdges(spark, d)
      val est = graph.Anf.run(spark, e, rounds = 2).filter($"node" % 16 === 0)
      val seeds = e.select($"src").distinct().filter($"src" % 16 === 0)
      val hop1 = seeds.join(e, "src").select($"src", $"dst".as("member"))
      val hop2 = hop1.join(e.select($"src".as("member"), $"dst".as("far")), "member")
        .select($"src", $"far".as("member"))
      val ball = hop1.union(hop2)
        .union(seeds.select($"src", $"src".as("member"))).distinct()
        .groupBy($"src".as("node")).agg(count(lit(1)).as("ball2"))
      val ref = est.join(ball, "node")
        .select($"node", $"ball2",
          (abs($"est" - $"ball2".cast("double")) <= lit(0.4) * $"ball2".cast("double"))
            .as("anf_ok"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val fast = graph.Anf.quotientPartEdit(spark, d, sampleMod = 16, tol = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(fast === ref, s"ANF quotient diverges at $d")
      assert(fast.nonEmpty && fast.forall(_._3), s"anf_ok must hold everywhere at $d")
    }
  }
}
