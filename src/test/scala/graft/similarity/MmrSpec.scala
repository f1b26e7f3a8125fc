package graft.similarity

import graft.{SparkEntry, SparkSpec, Tables}

/** E19 (round-13): MMR diversified re-ranking — the engine's greedy
  * selection pinned against a full INDEPENDENT JVM implementation of
  * the documented arithmetic (quantized dot: Σ floor(x·y·1e12+0.5)
  * as BIGINT / 1e12; decimal-accumulated norms; λ = 0.7 pinned-IEEE
  * scoring; raw-rel first pick; (mmr desc, id asc) ties), plus the
  * diversity witness that makes the operator non-vacuous. */
class MmrSpec extends SparkSpec {

  private val K = 5
  private val POOL = 10
  private val NQ = 10

  private def jvmMmr(): Map[Long, Seq[(Long, Long, Double, Double, Double)]] = {
    val embs = Tables.embeddings(spark, sfDir).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def nrm(v: Array[Float]): Double = {
      // BigDecimal.decimal (shortest-string / valueOf) — the SAME
      // double→decimal conversion Spark's CAST(DOUBLE AS DECIMAL)
      // performs; new BigDecimal(double) would take the exact binary
      // expansion and can round differently at the 12th digit
      // (round-13 third review pass)
      var acc = BigDecimal(0)
      v.foreach { x =>
        val xd = x.toDouble
        acc += BigDecimal.decimal(xd * xd).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      math.sqrt(acc.doubleValue)
    }
    val norms = embs.map { case (id, v) => id -> nrm(v) }
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (embs(a), embs(b))
      var s = 0L
      var i = 0
      while (i < va.length) {
        s += math.floor(va(i).toDouble * vb(i).toDouble * 1e12 + 0.5).toLong
        i += 1
      }
      (s.toDouble / 1e12) / (norms(a) * norms(b))
    }
    (0L until NQ.toLong).map { q =>
      val pool = embs.keys.filter(_ != q).toSeq
        .map(n => (n, cos(q, n)))
        .sortBy { case (n, rel) => (-rel, n) }
        .take(POOL)
      val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Double, Double)]
      val first = pool.head // pool is (rel desc, id asc) sorted
      sel += ((first._1, 1L, first._2, 0.0, 0.7 * first._2 - 0.3 * 0.0))
      for (t <- 2 to K) {
        val pick = pool.filterNot(p => sel.exists(_._1 == p._1))
          .map { case (n, rel) =>
            val maxSim = sel.map(s => cos(n, s._1)).max
            (n, rel, maxSim, 0.7 * rel - 0.3 * maxSim)
          }
          .sortBy { case (n, _, _, mmr) => (-mmr, n) }
          .head
        sel += ((pick._1, t.toLong, pick._2, pick._3, pick._4))
      }
      q -> sel.toSeq
    }.toMap
  }

  test("s_mmr: engine selection equals the independent JVM greedy, bit-exact") {
    val got = SparkEntry.queries("s_mmr")(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1))
          .map(r => (r.getLong(2), r.getLong(1), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
          .toSeq
      }
    val want = jvmMmr()
    assert(got.keySet === want.keySet)
    got.foreach { case (q, rows) =>
      assert(rows === want(q), s"query $q: selection diverges from the JVM greedy")
    }
  }

  test("s_mmr: structure — first pick is E1's #1, scores recompute, diversity is real") {
    val brute = SparkEntry.queries("s_knn_brute")(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    val rows = SparkEntry.queries("s_mmr")(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === (1L to K.toLong), s"query $q ranks")
      // the first pick is pure relevance — E1's top neighbor
      assert(ordered.head.getLong(2) === brute(q).head, s"query $q first pick")
      ordered.foreach { r =>
        assert(r.getDouble(5) === 0.7 * r.getDouble(3) - 0.3 * r.getDouble(4),
          s"query $q: mmr must recompute from (rel, max_sim)")
        assert(r.getLong(2) !== q)
      }
      assert(ordered.head.getDouble(4) === 0.0, "first pick has no selected set")
      // later picks carry a REAL cosine (negative is fine on random
      // embeddings — exact equality with the selected set's max is
      // what the JVM recomputation test pins); here just the bound
      assert(ordered.tail.forall(r => math.abs(r.getDouble(4)) <= 1.0001))
    }
    // the operator is non-vacuous: on the shipped corpus EVERY query
    // reorders vs pure top-K relevance (uniform-random embeddings
    // keep near-duplicate relevance scores, so the diversity term
    // decides) — if even ONE stops differing, diversification has
    // silently degraded toward the identity somewhere
    val mmrLists = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq }
    mmrLists.foreach { case (q, l) =>
      assert(l !== brute(q).take(K),
        s"query $q: MMR equals pure relevance — diversification vacuous there")
    }
  }

  test("s_mmr plan shapes: the pool broadcast is the one deliberate cross; sims stay keyed") {
    // the key checkpoints both frames, so PlanShapeSpec's all-keys
    // sweep sees only LogicalRDD scans — assert the PRE-checkpoint
    // shapes here (round-13 third review pass)
    val pool = SimilarityPack.mmrPool(spark, sfDir)
    val pp = pool.queryExecution.sparkPlan.toString
    assert(!pp.contains("CartesianProduct"), s"pool has a cartesian:\n$pp")
    assert(pp.contains("BroadcastNestedLoopJoin"),
      "the bounded query broadcast should plan as the deliberate BNLJ")
    val sims = SimilarityPack.mmrSims(spark, sfDir, pool.localCheckpoint(true))
    val sp = sims.queryExecution.sparkPlan.toString
    assert(!sp.contains("CartesianProduct") && !sp.contains("BroadcastNestedLoopJoin"),
      s"sims must be keyed equi-join work only:\n$sp")
  }
}
