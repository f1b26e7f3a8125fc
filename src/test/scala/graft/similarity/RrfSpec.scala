package graft.similarity

import graft.{SparkEntry, SparkSpec}

/** E16 (round-12): reciprocal-rank fusion — the fused surface pinned
  * against its own inputs (E1's ranks) and the RRF definition. */
class RrfSpec extends SparkSpec {

  private val C = 60 // the standard RRF constant the key uses
  private val K = 5

  test("s_rrf: scores recompute from the rank columns; fused lists are exact top-K") {
    val rows = SparkEntry.queries("s_rrf")(spark, sfDir).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length === K, s"query $q: fused list must have exactly $K rows")
      // fused_rank is 1..K ordered by (rrf_scaled desc, n_id asc)
      val ordered = rs.sortBy(_.getLong(1))
      assert(ordered.map(_.getLong(1)).toSeq === (1L to K.toLong))
      val scores = ordered.map(r => (r.getLong(5), r.getLong(2)))
      assert(scores.toSeq === scores.sortBy { case (s, n) => (-s, n) }.toSeq,
        s"query $q: fused order must follow (rrf_scaled desc, n_id asc)")
      rs.foreach { r =>
        def rankTerm(i: Int): Long =
          if (r.isNullAt(i)) 0L else math.floor(1e12 / (C + r.getLong(i))).toLong
        assert(!(r.isNullAt(3) && r.isNullAt(4)),
          s"query $q: a fused row must come from at least one retriever")
        assert(r.getLong(5) === rankTerm(3) + rankTerm(4),
          s"query $q n_id ${r.getLong(2)}: rrf_scaled must equal the term sum")
        Seq(3, 4).foreach(i =>
          if (!r.isNullAt(i)) assert(r.getLong(i) >= 1 && r.getLong(i) <= K))
      }
    }
  }

  test("s_rrf: cosine ranks agree with s_knn_brute; a doc both retrievers rank #1 fuses #1") {
    val brute = SparkEntry.queries("s_knn_brute")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("s_rrf")(spark, sfDir).collect()
    rows.foreach { r =>
      if (!r.isNullAt(3))
        assert(brute.get((r.getLong(0), r.getLong(2))).contains(r.getLong(3)),
          s"rank_cos must be E1's rank for (${r.getLong(0)}, ${r.getLong(2)})")
    }
    // agreement property: when both retrievers put the same doc at
    // rank 1, no other doc can out-score 2/(C+1)… except another
    // doubly-ranked doc with equal score — impossible, scores strictly
    // decrease in rank and docs are unique per rank
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      rs.find(r => !r.isNullAt(3) && !r.isNullAt(4) &&
          r.getLong(3) === 1L && r.getLong(4) === 1L)
        .foreach(r => assert(r.getLong(1) === 1L,
          s"query $q: doubly-first doc must fuse first"))
    }
  }
}
