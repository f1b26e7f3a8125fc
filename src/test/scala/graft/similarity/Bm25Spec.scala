package graft.similarity

import java.util.Locale

import graft.{SparkEntry, SparkSpec, Tables}

/** E17/E18 (round-13): BM25 lexical retrieval and the true hybrid
  * fusion. The load-bearing test is the INDEPENDENT recomputation:
  * the whole contract — normalization, tf/df/dl, the rarest-term
  * budget, the pinned-IEEE rational-idf term score, the fixed-point
  * term sum, the (score desc, id asc) top-K — is re-derived here in
  * plain Scala (same IEEE op order ⇒ bit-identical doubles ⇒
  * identical floors) and compared EXACTLY against the engine. */
class Bm25Spec extends SparkSpec {

  private val K = 5
  private val NQ = 10
  private val BUDGET = 8
  private val C = 60

  /** The full E17 contract in plain JVM arithmetic. */
  private def jvmBm25(): Map[Long, Seq[(Long, Long)]] = {
    // trim strips ASCII SPACES ONLY — Spark's (and DuckDB's) trim
    // semantics; java.lang.String.trim would also strip \t/\n and
    // silently diverge from a CORRECT engine on documents with
    // non-space edge whitespace (round-13 review)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).replaceAll("^ +| +$", "").toLowerCase(Locale.ROOT)
          .replaceAll("\\s+", " ").split(" ", -1))
      .toMap
    val tf: Map[(Long, String), Long] = docs.toSeq
      .flatMap { case (id, ws) => ws.map(w => (id, w)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df: Map[String, Long] =
      tf.keys.toSeq.map(_._2).groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val dl: Map[Long, Long] =
      tf.toSeq.groupBy(_._1._1).map { case (id, v) => id -> v.map(_._2).sum }
    val n = docs.size.toLong
    val avgdl = dl.values.sum.toDouble / n.toDouble
    (0L until NQ.toLong).filter(docs.contains).map { q =>
      val budget = tf.keys.toSeq.collect { case (id, t) if id == q => t }
        .map(t => (df(t), t)).sorted.take(BUDGET).map(_._2).toSet
      val cands = docs.keys.filter(c => c != q && budget.exists(t => tf.contains((c, t))))
      val scored = cands.toSeq.map { cand =>
        val s = budget.toSeq.flatMap { t =>
          tf.get((cand, t)).map { f =>
            val idf = (((n - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5)) / n.toDouble
            val tfnorm = (f.toDouble * 2.2) /
              (f.toDouble + 1.2 * (0.25 + 0.75 * (dl(cand).toDouble / avgdl)))
            math.floor((idf * tfnorm) * 1000000.0).toLong
          }
        }.sum
        (cand, s)
      }
      q -> scored.sortBy { case (id, s) => (-s, id) }.take(K)
    }.toMap
  }

  test("s_bm25: engine top-K equals the independent JVM recomputation, bit-exact") {
    val got = SparkEntry.queries("s_bm25")(spark, sfDir).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) =>
        q -> rs.sortBy(_.getLong(1)).map(r => (r.getLong(2), r.getLong(3))).toSeq
      }
    val want = jvmBm25().map { case (q, v) => q -> v.map { case (id, s) => (id, s) } }
      .filter(_._2.nonEmpty)
    assert(got.keySet === want.keySet)
    got.foreach { case (q, rows) =>
      assert(rows === want(q), s"query $q: engine top-K diverges from the JVM recomputation")
    }
    // ≥ 2 queries must produce full K lists or the corpus exercises
    // nothing (guards a future pruning regression going empty again)
    assert(got.values.count(_.size == K) >= 2)
  }

  test("s_bm25: fixed-point invariants — bm25 = score_scaled/1e6, ranks contiguous") {
    val rows = SparkEntry.queries("s_bm25")(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === (1L to rs.length.toLong), s"query $q ranks")
      val scores = ordered.map(r => (r.getLong(3), r.getLong(2)))
      assert(scores.toSeq === scores.sortBy { case (s, id) => (-s, id) }.toSeq,
        s"query $q: order must follow (score_scaled desc, n_id asc)")
      ordered.foreach { r =>
        assert(r.getLong(3) >= 0L)
        assert(r.getDouble(4) === r.getLong(3).toDouble / 1000000.0)
        assert(r.getLong(2) !== q, s"query $q retrieved itself")
      }
    }
  }

  test("s_rrf_hybrid: lexical ranks agree with s_bm25, fusion recomputes from rank columns") {
    val lex = SparkEntry.queries("s_bm25")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("s_rrf_hybrid")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(4))
        assert(lex.get((r.getLong(0), r.getLong(2))).contains(r.getLong(4)),
          s"rank_lex must be E17's rank for (${r.getLong(0)}, ${r.getLong(2)})")
      def rankTerm(i: Int): Long =
        if (r.isNullAt(i)) 0L else math.floor(1e12 / (C + r.getLong(i))).toLong
      assert(!(r.isNullAt(3) && r.isNullAt(4)),
        "a fused row must come from at least one retriever")
      assert(r.getLong(5) === rankTerm(3) + rankTerm(4), "rrf_scaled must equal the term sum")
    }
    // the two arms genuinely decorrelate on this corpus: at least one
    // fused row exists that only ONE retriever surfaced
    assert(rows.exists(r => r.isNullAt(3) ^ r.isNullAt(4)),
      "expected at least one single-arm fused row (decorrelated retrievers)")
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === (1L to rs.length.toLong), s"query $q ranks")
      val scores = ordered.map(r => (r.getLong(5), r.getLong(2)))
      assert(scores.toSeq === scores.sortBy { case (s, n) => (-s, n) }.toSeq,
        s"query $q: fused order must follow (rrf_scaled desc, n_id asc)")
    }
  }
}
