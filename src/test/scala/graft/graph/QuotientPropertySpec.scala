package graft.graph

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized structural check of the quotient fast paths' central
  * claim — that summing size(c) copies of one quantized decimal IS
  * integer multiplication, so class-level arithmetic is bit-identical
  * to the part-level loop — on graphs the shipped dataset never
  * produces (uneven class sizes, missing sizes, multiple components,
  * single-class brands). Seeded RNG: deterministic, replayable. */
class QuotientPropertySpec extends SparkSpec {

  private def randomClasses(rng: scala.util.Random): Map[(String, Long), Long] = {
    val brands = 2 + rng.nextInt(3)
    (for {
      b <- 1 to brands
      s <- 1L to 8L
      if rng.nextDouble() < 0.6 // holes in the size range
    } yield (s"B$b", s) -> (1L + rng.nextInt(4))).toMap
  }

  /** Part table: globally unique ids per class member. */
  private def partsOf(sizes: Map[(String, Long), Long]): Seq[(Long, String, Long)] = {
    var id = 0L
    sizes.toSeq.sortBy(_._1).flatMap { case ((b, s), n) =>
      (1L to n).map { _ => id += 1; (id, b, s) }
    }
  }

  test("HITS quotient ≡ distributed loop on 6 random class graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(20260814L)
    var trialsRun = 0
    for (trial <- 1 to 6) {
      val sizes = randomClasses(rng)
      val parts = partsOf(sizes)
      val byClass = parts.groupBy(p => (p._2, p._3)).view.mapValues(_.map(_._1)).toMap
      val edges = for {
        ((b, s), srcs) <- byClass.toSeq
        dsts <- byClass.get((b, s + 1)).toSeq
        u <- srcs; v <- dsts
      } yield (u, v)
      if (edges.nonEmpty) {
        trialsRun += 1
        val dist = Hits.run(edges.toDF("src", "dst"), iters = 3)
          .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
        val classEdges = sizes.keys.toSeq
          .filter { case (b, s) => sizes.contains((b, s + 1)) }
          .map { case (b, s) => ((b, s), (b, s + 1)) }
        val scores = Hits.quotientScores(sizes, classEdges, iters = 3)
        val fast = parts.flatMap { case (id, b, s) =>
          scores.get((b, s)).map(id -> _)
        }.toMap
        assert(fast.keySet === dist.keySet, s"trial $trial node sets")
        fast.foreach { case (n, (hub, auth)) =>
          assert(dist(n)._1 === hub, s"trial $trial hub of $n")
          assert(dist(n)._2 === auth, s"trial $trial authority of $n")
        }
      }
    }
    assert(trialsRun >= 3, s"only $trialsRun non-degenerate trials — property under-exercised")
  }

  test("RA quotient ≡ fact-level operator on 6 random class graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(14082026L)
    var trialsRun = 0
    for (trial <- 1 to 6) {
      val sizes = randomClasses(rng)
      val parts = partsOf(sizes)
      val partsDF = parts.toDF("p_partkey", "p_brand", "p_size")
      val byClass = parts.groupBy(p => (p._2, p._3)).view.mapValues(_.map(_._1)).toMap
      val up = for {
        ((b, s), srcs) <- byClass.toSeq
        delta <- Seq(1L, 2L)
        dsts <- byClass.get((b, s + delta)).toSeq
        u <- srcs; v <- dsts
      } yield (u, v)
      if (up.nonEmpty) {
        trialsRun += 1
        val sym = (up ++ up.map(_.swap)).toDF("src", "dst")
        val facts = LinkPrediction.resourceAllocation(sym, 50).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        val quot = LinkPrediction.resourceAllocationQuotient(spark, partsDF, 50).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
        assert(quot.toSeq === facts.toSeq, s"trial $trial")
      }
    }
    assert(trialsRun >= 3, s"only $trialsRun non-degenerate trials — property under-exercised")
  }

  test("node-Jaccard quotient ≡ positional-block engine on 6 random class graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(26081408L)
    var trialsRun = 0
    for (trial <- 1 to 6) {
      val sizes = randomClasses(rng)
      val parts = partsOf(sizes)
      val byClass = parts.groupBy(p => (p._2, p._3)).view.mapValues(_.map(_._1)).toMap
      val up = for {
        ((b, s), srcs) <- byClass.toSeq
        delta <- Seq(1L, 2L)
        dsts <- byClass.get((b, s + delta)).toSeq
        u <- srcs; v <- dsts
      } yield (u, v)
      if (up.nonEmpty) {
        trialsRun += 1
        val sym = (up ++ up.map(_.swap)).toDF("src", "dst")
        def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Double)] =
          df.collect().map(r =>
            (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        val dist = asSet(NodeSimilarity.jaccard(spark, sym))
        val fast = asSet(NodeSimilarity.quotientStamp(spark, sizes,
          parts.toDF("id", "brand", "size")))
        assert(fast === dist, s"trial $trial: quotient diverges (sizes=$sizes)")
      }
    }
    assert(trialsRun >= 3, s"only $trialsRun non-degenerate trials — property under-exercised")
  }

  test("PPR refined quotient ≡ distributed loop on 6 random class graphs with random seeds") {
    import spark.implicits._
    val rng = new scala.util.Random(14268020L)
    var trialsRun = 0
    for (trial <- 1 to 6) {
      val sizes = randomClasses(rng)
      val parts = partsOf(sizes)
      // RANDOM seed flags: the refinement must hold for any seed set,
      // not just the shipped every-100th rule
      val flagged = parts.map(p => (p._1, p._2, p._3, rng.nextDouble() < 0.3))
      val byClass = parts.groupBy(p => (p._2, p._3)).view.mapValues(_.map(_._1)).toMap
      val up = for {
        ((b, s), srcs) <- byClass.toSeq
        dsts <- byClass.get((b, s + 1)).toSeq
        u <- srcs; v <- dsts
      } yield (u, v)
      if (up.nonEmpty && flagged.exists(_._4)) {
        trialsRun += 1
        val sym = (up ++ up.map(_.swap)).toDF("src", "dst")
        val seeds = flagged.filter(_._4).map(_._1).toDF("node")
        def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
          df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        val dist = asMap(PersonalizedPageRank.run(spark, sym, seeds, iters = 4))
        val fast = asMap(PersonalizedPageRank.quotientRefined(spark,
          flagged.toDF("id", "brand", "size", "is_seed"), iters = 4))
        assert(fast.keySet === dist.keySet, s"trial $trial node sets (sizes=$sizes)")
        fast.foreach { case (n, r) =>
          assert(dist(n) === r, s"trial $trial rank of $n") }
      }
    }
    assert(trialsRun >= 3, s"only $trialsRun non-degenerate trials — property under-exercised")
  }

  test("ANF class-ball quotient ≡ 2-round register propagation + exact ball on 6 random class graphs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(20140826L)
    var trialsRun = 0
    for (trial <- 1 to 6) {
      val sizes = randomClasses(rng)
      val parts = partsOf(sizes)
      val byClass = parts.groupBy(p => (p._2, p._3)).view.mapValues(_.map(_._1)).toMap
      val up = for {
        ((b, s), srcs) <- byClass.toSeq
        dsts <- byClass.get((b, s + 1)).toSeq
        u <- srcs; v <- dsts
      } yield (u, v)
      if (up.nonEmpty) {
        trialsRun += 1
        val e = (up ++ up.map(_.swap)).toDF("src", "dst")
        // the single-sourced g_anf reference composition (2
        // propagation rounds + exact wedge-join 2-ball), sampleMod 1
        // = every node; est compared too — a pure function of the
        // registers, so est equality pins the bit-identical merge
        def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Boolean)] =
          df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
        val ref = asSet(Anf.propagationReference(spark, e, sampleMod = 1, tol = 0.4))
        val fast = asSet(Anf.quotientBlowupEst(spark,
          parts.toDF("node", "brand", "size"), sampleMod = 1, tol = 0.4))
        assert(fast === ref, s"trial $trial: quotient diverges (sizes=$sizes)")
      }
    }
    assert(trialsRun >= 3, s"only $trialsRun non-degenerate trials — property under-exercised")
  }

  test("Luby MIS quotient ≡ edge-set loop on 6 random class graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(8202614L)
    var trialsRun = 0
    for (trial <- 1 to 6) {
      val sizes = randomClasses(rng)
      val parts = partsOf(sizes)
      val byClass = parts.groupBy(p => (p._2, p._3)).view.mapValues(_.map(_._1)).toMap
      // the wide (±1, ±2) blow-up, both orientations — what
      // GraphBuilder.partEdgesWide builds from a part table
      val up = for {
        ((b, s), srcs) <- byClass.toSeq
        delta <- Seq(1L, 2L)
        dsts <- byClass.get((b, s + delta)).toSeq
        u <- srcs; v <- dsts
      } yield (u, v)
      if (up.nonEmpty) {
        trialsRun += 1
        val sym = (up ++ up.map(_.swap)).toDF("src", "dst")
        val vertsDF = parts.map(_._1).toDF("id")
        val partsDF = parts.toDF("node", "brand", "size")
        def asSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Boolean, Option[Long])] =
          df.collect().map(r => (r.getLong(0), r.getBoolean(1),
            if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
        val dist = asSet(Mis.run(spark, vertsDF, sym))
        val fast = asSet(Mis.quotientBlowup(spark, partsDF, maxIter = 25))
        assert(fast === dist, s"trial $trial: quotient diverges (sizes=$sizes)")
      }
    }
    assert(trialsRun >= 3, s"only $trialsRun non-degenerate trials — property under-exercised")
  }
}
