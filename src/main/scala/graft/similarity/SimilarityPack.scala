package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Similarity-search pack (SURVEY §2 E1–E3) over `embeddings`.
  *
  * E1 is the correctness baseline: brute-force cosine top-k with the
  * scale-correct plan shape — the (small) query set is broadcast
  * against the corpus scan, cosine is computed map-side, and the
  * per-query top-k is one hash-partitioned window. No corpus×corpus
  * shuffle anywhere.
  *
  * E2 is the scale path: random-hyperplane LSH (16 deterministic
  * md5-sign planes, 8 bands × 2 bits) buckets the corpus; each query
  * only scores candidates sharing a band key. On uniform-random
  * vectors (this synthetic table — the known worst case for LSH) the
  * 2-bit bands are deliberately permissive to keep recall ≥ 0.9; on
  * real clustered embeddings the same plan with wider bands prunes
  * aggressively. Both queries are fully deterministic, so BOTH get
  * exact SQL oracles; the recall spec lives in the test suite.
  */
object SimilarityPack extends QueryPack {

  private val K = 5
  private[similarity] val N_QUERIES = 10 // query set: vec_id < 10
  private val PLANES = 16
  private val BANDS = 8
  private[similarity] val NLIST = 16 // IVF coarse cells
  private[similarity] val NPROBE = 4 // cells probed per query
  // E5 product quantization: M subspaces of SUBDIM dims, NCODES
  // codewords per subspace (codebook = sub-vectors of the first
  // NCODES vectors — deterministic, like the IVF centroid policy).
  private val PQ_M = 8
  private val PQ_SUBDIM = 8
  private val PQ_NCODES = 4
  // E7 radius search: emit every corpus vector at least this similar
  private val RANGE_MIN_COSINE = 0.3
  // E10 kNN-join: every corpus vector's approximate top-k among ALL
  // vectors (the kNN-graph build). Wider 8-bit band buckets (2 bands
  // of PLANES/2) than E2's query-probe 2-bit bands: the symmetric
  // join pays Σ bucket² across the whole corpus, so buckets must be
  // ~n/256, not ~n/4.
  private val KNN_JOIN_BANDS = 2
  private val KNN_JOIN_K = 3

  // E9 late-interaction MaxSim: the corpus regroups into multi-vector
  // "documents" of DOC_W consecutive vectors; the query is the first
  // QVECS vectors as ONE multi-vector query; top TOPK docs win.
  private val MAXSIM_DOC_W = 8
  private val MAXSIM_QVECS = 8
  private val MAXSIM_TOPK = 10
  // E8 k-means: clusters, full assign/update cycles before the final
  // assignment. Init = the K lowest-vec_id embeddings (the same
  // deterministic seed policy as IVF/PQ/SemDeDup).
  private val KM_K = 8
  private val KM_ITERS = 2
  // E12 binary quantization: hamming shortlist size before the exact
  // cosine re-rank
  private val BQ_RERANK = 50
  // E21 IVF-PQ refine: ADC shortlist size before the exact cosine
  // re-rank (the FAISS refine step; same budget as E12's shortlist)
  private val PQ_RERANK = 50
  /** E16 RRF: the standard fusion constant (Cormack et al. 2009). */
  private val RRF_C = 60

  /** E17 BM25 (Robertson–Spärck Jones, Okapi): the standard
    * constants — k1 saturates term frequency, b interpolates
    * document-length normalization. They appear as decimal literals
    * inside [[bm25TermSql]] (the single source both engines parse),
    * not as Scala values, so the two engines can never disagree on
    * the double they denote. */
  private val BM25_SCALE = 1000000L // fixed-point term-score scale
  /** E19 MMR: candidate-pool width and the λ relevance/diversity
    * trade-off (Carbonell–Goldstein 1998's standard 0.7). λ appears
    * only as the decimal literals 0.7/0.3 written identically in the
    * Spark plan and the oracle, so both engines score with the same
    * doubles. */
  private val MMR_POOL = 10

  /** E17 query-term budget: each query retrieves through its
    * QTERM_BUDGET RAREST terms (df ASC, term ASC — deterministic).
    * This is the scale bound on the inverted-index join — a query can
    * pull at most this many posting lists no matter how many terms it
    * has — and rarest-first prefers exactly the selective terms BM25
    * weights highest (a common term a budget evicts would have
    * contributed near-zero idf anyway). A df-threshold stopword cut
    * (the obvious alternative) degenerates on small-vocabulary
    * corpora where every term is in most documents — this one's
    * per-query work is bounded and non-empty on ANY df shape. */
  private val QTERM_BUDGET = 8

  /** The BM25 per-term score over columns (tf, df, dl, n_docs,
    * avgdl), fixed-point-scaled to an exact BIGINT — ONE string
    * consumed verbatim by BOTH the Spark plan and the DuckDB oracle,
    * so the IEEE op tree is identical by construction (`+ * /` are
    * IEEE-exact single ops in both engines; both parsers give the
    * standard left-associative precedence):
    *
    *   idf    = ((N − df + 0.5) / (df + 0.5)) / N        (log-FREE:
    *            the rational RSJ odds, normalized by N into (0, ~2/3]
    *            — a log idf would differ in final ulps between
    *            engines, the F11/F14 lesson, and an UN-normalized
    *            rational idf would grow linearly in corpus size and
    *            overflow the fixed-point sum at petabyte N)
    *   tfnorm = (tf·(k1+1)) / (tf + k1·(1 − b + b·(dl/avgdl)))
    *   term   = floor(idf · tfnorm · 1e6)  as BIGINT
    *
    * with k1 = 1.2, b = 0.75 folded to literals (2.2 = k1+1,
    * 0.25 = 1−b). Per-term values are pinned IEEE doubles; the
    * per-document score is a SUM OF EXACT BIGINTs — no float
    * accumulation, so it is independent of aggregation order (the
    * same discipline as E16's floor(1e12/(C+rank)) fusion terms).
    * Bounded: idf ≤ ~0.67, tfnorm < k1+1 ⇒ term < 1.5e6, and a
    * BIGINT sum over even a 10^9-term document stays far under 2^63
    * while any REACHABLE document score stays under 2^53 — exactly
    * representable as a double for the TopKByScore ranking. */
  private val bm25TermSql =
    "CAST(floor((((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5) / " +
      "CAST(n_docs AS DOUBLE)) * ((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + " +
      "1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl))))) * 1000000.0) AS BIGINT)"

  /** Per-query top-k via the bounded [[graft.functions.TopKByScore]]
    * aggregate: each map partition reduces to ≤ K entries per query
    * before the exchange, so the shuffle carries O(queries × K) rows —
    * a ROW_NUMBER window would shuffle and sort the entire candidate
    * set. Same (cosine DESC, n_id ASC) total order as the oracle. */
  private def topK(pairs: DataFrame, k: Int = K): DataFrame =
    pairs.groupBy(col("q_id"))
      .agg(graft.functions.GraftFunctions.topK(col("cosine"), col("n_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("n_id"), col("t.score").as("cosine"))

  private def kmeansBody(s: SparkSession, d: String): DataFrame = {
      import s.implicits._
      val e = Tables.embeddings(s, d)
      def assign(cents: Seq[(Int, Array[Double])]): Column = {
        val structs = cents.map { case (cid, c) =>
          val carr = array(c.map(lit(_)): _*)
          val d2 = aggregate(
            zip_with($"embedding", carr, (x, cc) =>
              ((x.cast("double") - cc) * (x.cast("double") - cc)).cast("decimal(28,12)")),
            lit(java.math.BigDecimal.ZERO).cast("decimal(28,12)"),
            (acc, v) => (acc + v).cast("decimal(28,12)")).cast("double")
          struct(d2.as("d2"), lit(cid).as("cid"))
        }
        array_min(array(structs: _*))
      }
      var cents: Seq[(Int, Array[Double])] = e.filter($"vec_id" < KM_K)
        .select($"vec_id", $"embedding".cast("array<double>"))
        .collect()
        .map(r => r.getLong(0).toInt -> r.getSeq[Double](1).toArray)
        .sortBy(_._1).toSeq
      for (_ <- 1 to KM_ITERS) {
        val asg = e.withColumn("best", assign(cents))
          .select($"vec_id", $"best.cid".as("cluster_id"))
        cents = e.join(asg, "vec_id")
          .select($"cluster_id", posexplode($"embedding").as(Seq("pos", "xf")))
          .groupBy($"cluster_id", $"pos")
          .agg(sum($"xf".cast("double").cast("decimal(28,12)")).as("sx"),
            count(lit(1)).as("n"))
          .select($"cluster_id", $"pos",
            ($"sx".cast("double") / $"n".cast("double")).as("c"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (cid, rows) =>
            cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray }
          .toSeq.sortBy(_._1)
      }
      e.withColumn("best", assign(cents))
        .select($"vec_id", $"best.cid".cast("long").as("cluster_id"),
          round($"best.d2", 6).as("dist2"))
  }

  /** One Lloyd's run per (session, scale dir): s_kmeans and
    * s_inertia share the assignment ([[graft.SessionCache]]'s
    * discipline). The checkpoint is LAZY: plan construction still
    * pays the algorithm's own centroid collects (inherent to
    * Lloyd's), but the full final-assignment scan runs only when a
    * consumer executes, and its blocks are then cached for the
    * other consumer. */
  private val kmCache = new graft.SessionCache[DataFrame]

  private def kmeansAssignments(s: SparkSession, d: String): DataFrame =
    kmCache.getOrCompute(s, d)(kmeansBody(s, d).localCheckpoint(eager = false))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1: brute-force cosine top-k per query vector.
    // ONE exact top-K per (session, scale dir) — the dense arm is
    // consumed by FIVE keys (itself, recall, both RRF fusions, the
    // matryoshka anchor), each of which re-ran the corpus × query
    // scoring pass (round 15, the ngramCandidates discipline; cold
    // cost visible via rep1_gap).
    "s_knn_brute" -> { (s, d) => bruteTopK(s, d) },

    // E13: FILTERED vector search — top-k under a metadata predicate
    // (the "only lang=en docs" / "only this tenant" case every vector
    // store serves). Strategy is PRE-filter: the predicate applies to
    // the corpus scan BEFORE any distance work, so cost scales with
    // the filtered subset, the top-k is exact over survivors (no
    // post-filter recall loss, the failure mode of filter-after-ANN
    // at selective predicates), and the predicate — here the vec_id
    // residue class standing in for a metadata column — is eligible
    // for scan pushdown/partition pruning at the source.
    "s_knn_filtered" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val q = e.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      val c = e.filter(pmod($"vec_id", lit(5)) === 0)
        .select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
      topK(c.crossJoin(broadcast(q))
        .filter($"q_id" =!= $"n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn")))
    },

    // E12: 1-bit binary-quantization ANN with exact re-ranking — the
    // memory-tier serving trick of modern vector stores: each vector
    // collapses to ONE 64-bit sign signature (64 dims × sign bit;
    // 256× smaller than the float vector), the first-phase scan ranks
    // candidates by hamming distance computed as bit_count(sig XOR
    // sig) — two codegen'd builtin ops on longs, no vector touched —
    // and only the BQ_RERANK shortlist per query reads real
    // embeddings for the exact-cosine re-rank. Both phases carry
    // total orders ((hamming ASC, n_id) then (cosine DESC, n_id)),
    // so the two-phase result is deterministic cross-engine; the
    // oracle recomputes hamming directly from per-dimension sign
    // disagreements — it never packs bits, so the packing itself is
    // verified through every pairwise distance. Shuffle: the hamming
    // phase reduces map-side to ≤ BQ_RERANK rows per query (bounded
    // TopKByScore), the re-rank join carries O(queries × BQ_RERANK).
    "s_knn_binary" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val base = Tables.embeddings(s, d)
      // Java long shifts wrap the shift count mod 64, so a >64-dim
      // embedding would silently alias sign bits and corrupt every
      // hamming distance; fail loudly instead (raise_error rides the
      // same projection, so the guard can't be pruned away).
      val sigs = base.select($"vec_id",
        when(size($"embedding") <= 64,
          expr("aggregate(sequence(0, size(embedding) - 1), 0L, " +
            "(acc, i) -> IF(element_at(embedding, i + 1) > 0, acc | shiftleft(1L, i), acc))"))
          .otherwise(raise_error(concat(
            lit("s_knn_binary packs sign bits into one 64-bit word; embedding has "),
            size($"embedding").cast("string"), lit(" dims (max 64)"))))
          .as("sig"))
      val qsig = sigs.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"sig".as("qsig"))
      val shortlist = sigs.select($"vec_id".as("n_id"), $"sig".as("nsig"))
        .crossJoin(broadcast(qsig))
        .filter($"q_id" =!= $"n_id")
        .withColumn("score", -expr("bit_count(qsig ^ nsig)").cast("double"))
        .groupBy($"q_id")
        .agg(graft.functions.GraftFunctions.topK($"score", $"n_id", BQ_RERANK).as("tk"))
        .select($"q_id", explode($"tk").as("t"))
        .select($"q_id", $"t.id".as("n_id"), (-$"t.score").cast("long").as("hamming"))
      val emb = base.withColumn("nrm", VectorOps.normDec("embedding"))
      val reranked = shortlist
        .join(emb.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn")), "n_id")
        .join(broadcast(emb.filter($"vec_id" < N_QUERIES)
          .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))), "q_id")
        .withColumn("cosine", VectorOps.dotDecFast($"qe", $"ne") / ($"qn" * $"nn"))
      // the ranking window sees ≤ BQ_RERANK rows per query — bounded
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"cosine".desc, $"n_id".asc)
      reranked.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"n_id", $"hamming", $"cosine")
    },

    // E11: ANN recall measurement ON the hard signal — recall@K of
    // the E2 LSH probe against the E1 exact top-k, per query. The
    // metric every ANN deployment must continuously report; both
    // engines derive both rankings deterministically, so the recall
    // fractions hash-compare exactly (eval discipline as a query, the
    // same move as C10/C15's guarantee booleans). Cost is the two
    // underlying plans plus one (q×K)-sized semi-join — query-set
    // bounded, corpus-free.
    "s_recall" -> { (s, d) =>
      import s.implicits._
      val ann = SimilarityPack.queries("s_knn_ann")(s, d).select($"q_id", $"n_id")
      val brute = SimilarityPack.queries("s_knn_brute")(s, d).select($"q_id", $"n_id")
      brute.join(ann, Seq("q_id", "n_id"), "left_semi")
        .groupBy($"q_id").agg(count(lit(1)).as("n_hits"))
        .join(brute.select($"q_id").distinct(), Seq("q_id"), "right")
        .select($"q_id", coalesce($"n_hits", lit(0L)).as("n_hits"))
        .withColumn("recall", $"n_hits".cast("double") / lit(K.toDouble))
    },

    // E15: MATRYOSHKA truncated-dimension retrieval + recall — the
    // MRL-embedding deployment question (Kusupati 2022): how much
    // recall@K survives searching on the PREFIX HALF of each vector?
    // The truncated ranking runs the exact E1 machinery over
    // slice(embedding, 1, dim/2) with renormalization (half the dot
    // FLOPs, half the bytes moved — the whole point of Matryoshka
    // training), and the key reports per-query recall against the
    // full-dimension exact top-k. Same eval-as-a-query discipline as
    // E11; cost is the two bounded rankings plus one (q×K) semi-join.
    "s_matryoshka" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
        .withColumn("tr", expr("slice(embedding, 1, size(embedding) div 2)"))
        .withColumn("nrm", VectorOps.normDec("tr"))
      val q = e.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"tr".as("qe"), $"nrm".as("qn"))
      val c = e.select($"vec_id".as("n_id"), $"tr".as("ne"), $"nrm".as("nn"))
      val half = topK(c.crossJoin(broadcast(q))
        .filter($"q_id" =!= $"n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn")))
        .select($"q_id", $"n_id")
      val brute = SimilarityPack.queries("s_knn_brute")(s, d).select($"q_id", $"n_id")
      brute.join(half, Seq("q_id", "n_id"), "left_semi")
        .groupBy($"q_id").agg(count(lit(1)).as("n_hits"))
        .join(brute.select($"q_id").distinct(), Seq("q_id"), "right")
        .select($"q_id", coalesce($"n_hits", lit(0L)).as("n_hits"))
        .withColumn("recall", $"n_hits".cast("double") / lit(K.toDouble))
    },

    // E10: approximate kNN-JOIN — every corpus vector's top-k nearest
    // neighbors among the whole corpus, the kNN-graph construction
    // that feeds SemDeDup-style clustering, label propagation over
    // embeddings, and outlier mining. No broadcast anywhere (both
    // sides are the corpus): candidates come from a symmetric LSH
    // band equi-join whose cost is Σ bucket² — the 8-bit band keys
    // keep buckets ~n/256 so candidate volume stays near-linear —
    // and the verify joins are co-partitioned equi-joins on vec_id.
    // Per-vector top-k is the map-side bounded TopK aggregate: the
    // final shuffle carries O(n·k) rows, never the candidate set.
    "s_knn_join" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val bands = VectorOps.bandKeys(
        VectorOps.signatures(Tables.embeddings(s, d), "vec_id", PLANES),
        "vec_id", PLANES, KNN_JOIN_BANDS)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.vec_id") =!= col("y.vec_id"))
        .select(col("x.vec_id").as("q_id"), col("y.vec_id").as("n_id"))
        .distinct()
      topK(cand
        .join(e.select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn")), "q_id")
        .join(e.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn")), "n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn")),
        KNN_JOIN_K)
    },

    // E9: multi-vector late-interaction retrieval (ColBERT MaxSim) —
    // score(doc) = Σ_q max_{v∈doc} cos(q, v) over a multi-vector
    // query: per-token max-similarity summed, the retrieval scorer
    // that beats single-vector cosine when queries and documents are
    // token-decomposed. Scale shape: the query's QVECS vectors
    // broadcast; cosines are map-side inside the corpus scan's
    // codegen stage; max-per-(doc, qvec) and sum-per-doc are both
    // partial-aggregable (shuffle carries O(docs × QVECS), never
    // corpus rows); the global top-k is a map-side bounded TopK
    // aggregate — O(k) per partition, no full sort. Determinism: the
    // per-(doc, qvec) max cosine is quantized to an exact BIGINT
    // (floor(c·1e9 + 0.5)) BEFORE the cross-doc sum, so the score
    // addition is order-free and cross-engine exact.
    "s_maxsim" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val q = e.filter($"vec_id" < MAXSIM_QVECS)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      val c = e.select(expr(s"vec_id DIV $MAXSIM_DOC_W").as("doc_id"),
        $"embedding".as("ne"), $"nrm".as("nn"))
      val scored = c.crossJoin(broadcast(q))
        .withColumn("cosine", VectorOps.dotDecFast($"qe", $"ne") / ($"qn" * $"nn"))
        .groupBy($"doc_id", $"q_id")
        .agg(max(floor($"cosine" * lit(1e9) + lit(0.5)).cast("long")).as("qmax"))
        .groupBy($"doc_id")
        .agg((sum($"qmax").cast("double") / lit(1e9)).as("score"))
      scored.groupBy()
        .agg(graft.functions.GraftFunctions.topK($"score", $"doc_id", MAXSIM_TOPK).as("tk"))
        .select(posexplode($"tk").as(Seq("pos", "t")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("t.id").as("doc_id"), col("t.score").as("score"))
    },

    // E7: radius (range) similarity search — ALL corpus vectors above
    // a cosine threshold per query, the recall-complete sibling of
    // top-k (near-duplicate audits, policy screens: "everything at
    // least this similar", not "the best k"). Same broadcast-queries
    // × corpus-scan shape as E1 — the threshold filter runs MAP-SIDE
    // inside the scan's codegen stage, so at 100 TB the only shuffled
    // rows are actual matches; result size is bounded by the data,
    // not by the corpus.
    "s_range_search" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val q = e.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      val c = e.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
      c.crossJoin(broadcast(q))
        .filter($"q_id" =!= $"n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn"))
        .filter($"cosine" >= RANGE_MIN_COSINE)
        .select($"q_id", $"n_id", $"cosine")
    },

    // E2: LSH-bucketed ANN top-k — score only same-band candidates.
    "s_knn_ann" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val bands = VectorOps.bandKeys(
        VectorOps.signatures(Tables.embeddings(s, d), "vec_id", PLANES),
        "vec_id", PLANES, BANDS)
      val qb = bands.filter($"vec_id" < N_QUERIES).select($"vec_id".as("q_id"), $"b", $"bv")
      val cand = qb.join(bands, Seq("b", "bv"))
        .filter($"q_id" =!= $"vec_id")
        .select($"q_id", $"vec_id".as("n_id"))
        .distinct()
      val q = e.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      val c = e.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
      topK(cand.join(broadcast(q), "q_id").join(c, "n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn")))
    },

    // E3: IVF (inverted-file) ANN top-k — the clustered-index scale
    // path. Coarse centroids are broadcast; every corpus vector is
    // assigned to its nearest cell MAP-SIDE (broadcast cross join +
    // bounded top-1 partial agg — the shuffle carries one row per
    // vector); each query probes its NPROBE nearest cells and scores
    // only that inverted list, reached by an equi-join on the cell id.
    // A corpus vector lives in exactly one cell, so candidate pairs
    // are already distinct — no dedup shuffle. Centroid choice is a
    // pluggable policy; here it is the deterministic first-NLIST
    // vectors so the oracle can derive the identical index (real
    // deployments would k-means-sample, which only changes the
    // centroid table, not the plan).
    "s_knn_ivf" -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      ivfTopK(Tables.embeddings(s, d), N_QUERIES, NLIST, NPROBE, K)
    },

    // E5: product-quantization ANN top-k (asymmetric distance
    // computation). Each corpus vector is encoded as M sub-space
    // codes against a broadcast codebook — after encoding, ranking
    // NEVER touches corpus vectors again, which is PQ's point: at
    // 100 TB the serving join carries (n_id, m, code) rows (M bytes
    // of code per vector, 32× smaller than fp32) while the
    // query-side lookup table (queries × M × NCODES sub-distances —
    // bounded, like a dimension) broadcasts. Distances stay in exact
    // integer picos end to end, so encode argmin, ADC sums and the
    // final ranking are bit-deterministic in both engines.
    "s_knn_pq" -> { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      pqAdcTopK(Tables.embeddings(s, d), cand = None)
    },

    // E20 (round-14): IVF-PQ composed ANN — the production FAISS
    // serving shape, built from E3's coarse quantizer and E5's code
    // machinery: queries probe their NPROBE nearest cells, and ADC
    // distance is evaluated ONLY over the probed cells' code rows.
    // Scale story: the serving join carries (n_id, cell, m, code)
    // rows (M bytes of code per corpus vector) restricted to probed
    // cells — candidate volume is (corpus/nlist)·nprobe per query
    // instead of the whole corpus, on 32×-compressed codes; the ADC
    // lookup table broadcasts like a dimension. Distances stay exact
    // integer picos end to end, so cells, codes, ADC sums and the
    // ranking are bit-deterministic in both engines.
    "s_knn_ivfpq" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
      val (ccell, qcell) = ivfAssign(e, N_QUERIES, NLIST, NPROBE)
      val cand = qcell.join(ccell, "cell")
        .filter($"q_id" =!= $"n_id")
        .select($"q_id", $"n_id")
      pqAdcTopK(e, cand = Some(cand))
    },

    // E21 (round-15): IVF-PQ with EXACT RE-RANK — the standard FAISS
    // refine step, E12's two-phase discipline applied to E20: the ADC
    // ranking produces a PQ_RERANK shortlist per query (still on
    // 32×-compressed codes over probed cells only), and ONLY the
    // O(queries × PQ_RERANK) survivors read real embeddings for the
    // exact-cosine re-rank. This closes the quality gap PQ
    // quantization leaves (measured at the rungs via
    // tools/RecallProbe: plain E20 recall 0.16/0.06/0.64 at
    // sf0.1/0.3x/1x on the uniform-synthetic worst case — the refine
    // recovers every brute-force hit the shortlist contains). Both
    // phases carry total orders ((adc ASC, n_id) then (cosine DESC,
    // n_id)), so the composed result is deterministic cross-engine;
    // the re-rank window sees ≤ PQ_RERANK rows per query.
    "s_knn_ivfpq_r" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d)
      val (ccell, qcell) = ivfAssign(e, N_QUERIES, NLIST, NPROBE)
      val cand = qcell.join(ccell, "cell")
        .filter($"q_id" =!= $"n_id")
        .select($"q_id", $"n_id")
      val shortlist = pqAdcTopK(e, cand = Some(cand), k = PQ_RERANK)
        .select($"q_id", $"n_id")
      val emb = e.withColumn("nrm", VectorOps.normDec("embedding"))
      val reranked = shortlist
        .join(emb.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn")), "n_id")
        .join(broadcast(emb.filter($"vec_id" < N_QUERIES)
          .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))), "q_id")
        .withColumn("cosine", VectorOps.dotDecFast($"qe", $"ne") / ($"qn" * $"nn"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"cosine".desc, $"n_id".asc)
      reranked.withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= K)
        .select($"q_id", $"rank", $"n_id", $"cosine")
    },

    // E4: symmetric int8 quantization of the embedding column — the
    // storage/serving step of an embedding pipeline (4× smaller than
    // fp32, cheap SIMD dot products downstream). Entirely row-local
    // map work (no shuffle at any scale); quantized values are
    // emitted as a checksum plus the max reconstruction error so the
    // oracle verifies the exact codes AND their fidelity. All math is
    // engine-portable IEEE (floor(x/scale + 0.5), no locale-dependent
    // rounding).
    "s_quantize" -> { (s, d) => quantized(Tables.embeddings(s, d)) },

    // E8: k-means (Lloyd's) over the embedding corpus — the standard
    // embedding-curation primitive (cluster-then-sample / SemDeDup's
    // real centroid step). Scale shape is MLlib's: the K×dim centroid
    // table is driver-bounded BY DEFINITION (that is what K-means
    // compresses to), so each iteration broadcasts the centroids as
    // codegen'd literals, the assignment is map-side (no join, no
    // shuffle), and the update is ONE partial-aggregable
    // (cluster, dim) shuffle. Determinism: squared-L2 terms quantize
    // to DECIMAL(28,12) before the order-free exact sum (the engine's
    // vector contract), means are one IEEE division of exact values,
    // ties break to the lowest centroid id — bit-identical to the
    // oracle's unrolled iterations.
    "s_kmeans" -> { (s, d) => kmeansAssignments(s, d) },

    // E14: clustering-quality report (per-cluster inertia — the SSE
    // readout that tells you whether K was right and which clusters
    // are diffuse): re-aggregates s_kmeans' per-vector dist2 (already
    // deterministic and 6-dp-rounded on both engines) as an EXACT
    // DECIMAL(28,6) sum per cluster — a raw double Σ would be
    // accumulation-order-dependent — plus each cluster's share of
    // total inertia. The assignment itself is memoized per (session,
    // scale dir) (the LPA cache discipline), so the report reuses the
    // materialized clustering instead of re-running Lloyd's.
    "s_inertia" -> { (s, d) =>
      import s.implicits._
      val D6 = org.apache.spark.sql.types.DecimalType(28, 6)
      val a = kmeansAssignments(s, d)
      val per = a.groupBy($"cluster_id")
        .agg(count(lit(1)).as("n_vectors"),
          sum($"dist2".cast(D6)).as("sse"))
      val tot = per.agg(sum($"sse").as("sse_total"))
      per.crossJoin(broadcast(tot))
        .select($"cluster_id", $"n_vectors",
          $"sse".cast("double").as("inertia"),
          ($"sse".cast("double") / $"sse_total".cast("double")).as("inertia_share"))
    },


    // E16 (round-12): RECIPROCAL-RANK FUSION — the standard hybrid-
    // retrieval combiner (Cormack/Clarke/Büttcher 2009: score(d) =
    // Σ_retrievers 1/(C + rank_r(d)), C = 60): two retrievers' top-K
    // lists fused per query. Retriever A is E1's exact cosine;
    // retriever B is the int8 symmetric-quantized dot (E4's scheme —
    // the compressed retriever, whose near-tie flips make the fusion
    // non-trivial). Determinism: the integer dot is an exact BIGINT
    // (dims ≤ 64, |q_i| ≤ 127 ⇒ |dot| < 2^21), its per-candidate
    // rescale is ONE IEEE multiply, and the RRF terms are the exact
    // integers floor(1e12/(C + rank)) summed as BIGINTs — no float
    // accumulation anywhere in the fused score. Scale shape: both
    // retrievers broadcast the N_QUERIES-bounded query set and reduce
    // through the bounded TopKByScore aggregate; only the fusion
    // join and its window — ≤ 2·N_QUERIES·K rows — run after that.
    "s_rrf" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val cos = queries("s_knn_brute")(s, d)
        .select($"q_id", $"n_id", $"rank".as("rank_cos"))
      val q8 = int8Columns(Tables.embeddings(s, d)).select($"vec_id", $"q", $"scale")
      val qq = q8.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"q".as("qa"))
      // ranked through the SAME bounded TopKByScore aggregate as every
      // other retriever — map partitions reduce to ≤ K rows per query
      // before the exchange (a ROW_NUMBER window here would shuffle
      // and sort the whole N_QUERIES × corpus candidate set)
      val int8 = topK(
        q8.select($"vec_id".as("n_id"), $"q".as("qb"), $"scale".as("sb"))
          .crossJoin(broadcast(qq))
          .filter($"q_id" =!= $"n_id")
          .withColumn("cosine",
            expr("aggregate(zip_with(qa, qb, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)")
              .cast("double") * $"sb")
          .select($"q_id", $"n_id", $"cosine"))
        .select($"q_id", $"n_id", $"rank".as("rank_int8"))
      def term(rank: Column): Column =
        coalesce(floor(lit(1e12) / (lit(RRF_C) + rank)).cast("long"), lit(0L))
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"rrf_scaled".desc, $"n_id".asc)
      cos.join(int8, Seq("q_id", "n_id"), "full_outer")
        .withColumn("rrf_scaled", term($"rank_cos") + term($"rank_int8"))
        .withColumn("fused_rank", row_number().over(wf).cast("long"))
        .filter($"fused_rank" <= K)
        .select($"q_id", $"fused_rank", $"n_id", $"rank_cos", $"rank_int8", $"rrf_scaled")
    },

    // E17: BM25 LEXICAL retrieval over `documents` — the missing
    // retrieval family next to the dense E1–E15 surface (and the
    // decorrelated arm E18's hybrid fusion needs). Queries are the
    // documents with doc_id < N_QUERIES (the id space the driver
    // aligns 1:1 with embeddings.vec_id, so lexical and dense ranks
    // are fusable per query). Scale shape: the classic inverted-index
    // join — the (bounded) query-term set broadcasts against the
    // (doc, term, tf) posting table on the TERM key; candidate volume
    // is Σ_t df(t) over ≤ QTERM_BUDGET rarest terms per query, never
    // corpus × corpus. Scoring is [[bm25TermSql]]'s fixed-point
    // contract; ranking runs through the bounded TopKByScore
    // aggregate on the EXACTLY-double-representable scaled score.
    "s_bm25" -> { (s, d) => bm25TopK(s, d) },

    // E18: TRUE HYBRID reciprocal-rank fusion — E16's combiner over
    // genuinely DECORRELATED retrievers: E1's dense exact cosine ×
    // E17's lexical BM25 (E16's two dense arms share embedding-space
    // failure modes; a lexical arm does not). Same exact-BIGINT RRF
    // terms; the fusion join and window see ≤ 2·N_QUERIES·K rows.
    "s_rrf_hybrid" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val cos = queries("s_knn_brute")(s, d)
        .select($"q_id", $"n_id", $"rank".as("rank_cos"))
      val lex = bm25TopK(s, d)
        .select($"q_id", $"n_id", $"rank".as("rank_lex"))
      def term(rank: Column): Column =
        coalesce(floor(lit(1e12) / (lit(RRF_C) + rank)).cast("long"), lit(0L))
      val wf = org.apache.spark.sql.expressions.Window
        .partitionBy($"q_id").orderBy($"rrf_scaled".desc, $"n_id".asc)
      cos.join(lex, Seq("q_id", "n_id"), "full_outer")
        .withColumn("rrf_scaled", term($"rank_cos") + term($"rank_lex"))
        .withColumn("fused_rank", row_number().over(wf).cast("long"))
        .filter($"fused_rank" <= K)
        .select($"q_id", $"fused_rank", $"n_id", $"rank_cos", $"rank_lex", $"rrf_scaled")
    },

    // E19 (round-13): MMR DIVERSIFIED re-ranking (Carbonell–
    // Goldstein 1998) — the search-diversification surface every
    // retrieval stack puts behind its top-k: greedily select K of the
    // top-MMR_POOL relevance candidates, each pick the argmax of
    //   mmr = 0.7·rel − 0.3·max_{s ∈ selected} sim(cand, s)
    // (max_sim = 0.0 for the first pick — the uniform form of the
    // rule), ties broken by n_id. Both rel and the pairwise sims are
    // the E1 exact-quantized-dot cosine contract, so every double is
    // cross-engine bit-identical and the greedy argmax sequence is
    // exact. Scale shape (round 15): the pool is the bounded
    // TopKByScore aggregate (one corpus scan); pairwise sims live
    // entirely in the ≤ queries·POOL² pool space; the greedy itself
    // then runs PER QUERY over its own ≤ POOL candidates + ≤ POOL²
    // sims — a bounded local fold ([[mmrGreedy]]) on the grouped
    // rows, replacing the old K−1 round DataFrame loop whose every
    // round paid an anti-join + aggregation + rank window + EAGER
    // checkpoint job over tiny data (measured 3.1 s, nearly all
    // scheduler round-trips — guide §1.2: per-task work after the
    // shape is right). The per-group state is POOL²-bounded by
    // construction at any corpus scale, and every double the greedy
    // compares was computed by the SAME engine expressions as before
    // (rel/sim collected verbatim; mmr = 0.7·rel − 0.3·max_sim in
    // identical IEEE order — MmrSpec pins the selection bit-exact
    // against an independent JVM greedy).
    "s_mmr" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val pool = mmrPool(s, d).localCheckpoint(false) // feeds sims too
      val sims = mmrSims(s, d, pool)
      val pg = pool.groupBy($"q_id")
        .agg(collect_list(struct($"n_id".as("_1"), $"rel".as("_2"))).as("pool"))
      val sg = sims.groupBy($"q_id")
        .agg(collect_list(struct($"a_id".as("_1"), $"b_id".as("_2"), $"sim".as("_3"))).as("sims"))
      pg.join(sg, Seq("q_id"), "left")
        .select($"q_id".as("_1"), $"pool".as("_2"), $"sims".as("_3"))
        .as[(Long, Seq[(Long, Double)], Option[Seq[(Long, Long, Double)]])]
        .flatMap { case (q, pl, sm) => mmrGreedy(q, pl, sm.getOrElse(Nil), K) }
        .toDF("q_id", "mmr_rank", "n_id", "rel", "max_sim", "mmr")
        .select($"q_id", $"mmr_rank", $"n_id", $"rel", $"max_sim", $"mmr")
    },

    // E6: composed embedding pipeline — semantic-dedup survivors
    // (D7's linear screen) flowing straight into int8 quantization as
    // ONE DataFrame plan (the embedding-side twin of t_pipeline:
    // dedup → transform → serving artifact). The join is an equi-join
    // on vec_id; everything downstream is row-local map work, so the
    // composition adds no shuffle beyond D7's own two.
    "s_pipeline" -> { (s, d) =>
      import s.implicits._
      val kept = graft.dedup.DedupPack.semanticScreen(s, d)
        .filter($"is_kept")
        .select($"vec_id", $"cluster_id")
      // ONE join; cluster_id rides through the quantization projection
      // (a second join back to `kept` would re-evaluate the whole
      // screening subtree — Spark does not share unpersisted subplans).
      quantized(Tables.embeddings(s, d).join(kept, "vec_id"), passThrough = Seq("cluster_id"))
        .select($"vec_id", $"cluster_id", $"scale", $"q_checksum", $"max_abs_err")
    },
  )

  /** E19's relevance pool — UNcheckpointed, factored out so MmrSpec
    * can assert its plan shape directly (the key checkpoints it,
    * which truncates the plan PlanShapeSpec's all-keys sweep sees to
    * a LogicalRDD scan; the deliberate broadcast-cross lives HERE). */
  /** E19's bounded per-query greedy (round 15): selects up to `k` of
    * the pool by mmr = 0.7·rel − 0.3·max sim-to-selected, first pick
    * by RAW rel (multiplying by λ could collapse distinct doubles
    * into ties; both engines rank the unscaled value), ties by n_id
    * asc. Candidate arithmetic and tie order replicate the old
    * DataFrame round loop exactly: a candidate needs ≥ 1 sim row to
    * the selected set (the inner-join semantics; sims are pairwise-
    * complete within a pool, so this only gates degenerate pools).
    * Returns (q_id, mmr_rank, n_id, rel, max_sim, mmr) tuples. */
  private[similarity] def mmrGreedy(q: Long, pool: Seq[(Long, Double)],
      sims: Seq[(Long, Long, Double)], k: Int)
      : Seq[(Long, Long, Long, Double, Double, Double)] = {
    if (pool.isEmpty) return Nil
    val sim = sims.map(t => (t._1, t._2) -> t._3).toMap
    val first = pool.minBy { case (n, rel) => (-rel, n) }
    val out = scala.collection.mutable.ArrayBuffer(
      (q, 1L, first._1, first._2, 0.0, 0.7 * first._2 - 0.3 * 0.0))
    val selected = scala.collection.mutable.ArrayBuffer(first._1)
    var t = 2
    var exhausted = false
    while (t <= k && !exhausted) {
      val cands = pool.iterator
        .filterNot(p => selected.contains(p._1))
        .flatMap { case (n, rel) =>
          val ss = selected.iterator.flatMap(b => sim.get((n, b))).toSeq
          if (ss.isEmpty) None
          else {
            val ms = ss.max
            Some((n, rel, ms, 0.7 * rel - 0.3 * ms))
          }
        }.toSeq
      if (cands.isEmpty) exhausted = true
      else {
        val p = cands.minBy { case (n, _, _, mmr) => (-mmr, n) }
        out += ((q, t.toLong, p._1, p._2, p._3, p._4))
        selected += p._1
        t += 1
      }
    }
    out.toSeq
  }

  private val bruteCache = new graft.SessionCache[DataFrame]

  /** E1's exact cosine top-K, single-sourced and session-cached (see
    * the s_knn_brute key note). */
  private def bruteTopK(s: SparkSession, d: String): DataFrame =
    bruteCache.getOrCompute(s, d) {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val q = e.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      val c = e.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
      topK(c.crossJoin(broadcast(q))
        .filter($"q_id" =!= $"n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn")))
        .localCheckpoint(false)
    }

  private[similarity] def mmrPool(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
    val q = e.filter($"vec_id" < N_QUERIES)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
    val c = e.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
    topK(c.crossJoin(broadcast(q))
        .filter($"q_id" =!= $"n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn")),
      MMR_POOL)
      .select($"q_id", $"n_id", $"cosine".as("rel"))
  }

  /** E19's pool-pairwise sims over a (checkpointed) pool frame —
    * equi-join keyed work only; spec-asserted shape. */
  private[similarity] def mmrSims(s: SparkSession, d: String, pool: DataFrame): DataFrame = {
    import s.implicits._
    val c = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      .select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
    val pv = pool.join(c, "n_id").select($"q_id", $"n_id", $"ne", $"nn")
    pv.as("x").join(pv.as("y"),
        col("x.q_id") === col("y.q_id") && col("x.n_id") =!= col("y.n_id"))
      .select(col("x.q_id").as("q_id"), col("x.n_id").as("a_id"),
        col("y.n_id").as("b_id"),
        (VectorOps.dotDecFast(col("x.ne"), col("y.ne")) /
          (col("x.nn") * col("y.nn"))).as("sim"))
  }

  /** E17's BM25 top-K, single-sourced for the s_bm25 key and E18's
    * lexical fusion arm. Returns (q_id, rank, n_id, score_scaled,
    * bm25). The tf/df/dl statistics derive from ONE tokenization
    * pass (the posting table is checkpointed for its four consumers:
    * df, corpus totals, query terms, candidates); dl rides the
    * posting rows via a window over the doc key so candidates never
    * pay a separate doc-length join. */
  private val bm25Cache = new graft.SessionCache[DataFrame]

  /** ONE BM25 top-K per (session, scale dir): consumed by s_bm25 AND
    * s_rrf_hybrid's lexical arm (round 15, the bruteTopK discipline). */
  private def bm25TopK(s: SparkSession, d: String): DataFrame =
    bm25Cache.getOrCompute(s, d) { bm25TopKUncached(s, d).localCheckpoint(false) }

  private def bm25TopKUncached(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val toks = Tables.documents(s, d)
      .select($"doc_id", explode(split(graft.text.TextOps.norm($"text"), " ")).as("term"))
    // posting table (doc, term, tf) + per-doc length from the same
    // shuffle's partitioning (window over doc_id)
    val tfd = toks.groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
      .withColumn("dl", sum($"tf").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")))
      .localCheckpoint(false)
    val dfreq = tfd.groupBy($"term").agg(count(lit(1)).as("df"))
    // one-row corpus stats; avgdl is the contract's single IEEE
    // division of exact integers
    val stats = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      .crossJoin(tfd.agg(sum($"tf").as("total_toks")))
      .withColumn("avgdl", $"total_toks".cast("double") / $"n_docs".cast("double"))
      .select($"n_docs", $"avgdl")
    // query-term set: each query doc's QTERM_BUDGET rarest distinct
    // terms (df ASC, term ASC) — the bounded window runs over
    // ≤ N_QUERIES × per-doc vocab rows, never the corpus
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"df".asc, $"term".asc)
    val qterms = tfd.filter($"doc_id" < N_QUERIES)
      .select($"doc_id".as("q_id"), $"term")
      .join(dfreq, "term")
      .withColumn("trank", row_number().over(wq))
      .filter($"trank" <= QTERM_BUDGET)
      .crossJoin(broadcast(stats))
    // inverted-index candidate join: postings stream against the
    // broadcast query-term set on the term key; self-match excluded
    val cands = tfd.join(
        broadcast(qterms.select($"term", $"q_id", $"df", $"n_docs", $"avgdl")), "term")
      .filter($"doc_id" =!= $"q_id")
      .withColumn("term_scaled", expr(bm25TermSql))
    val scored = cands.groupBy($"q_id", $"doc_id")
      .agg(sum($"term_scaled").as("score_scaled"))
    topK(scored.select($"q_id", $"doc_id".as("n_id"),
        $"score_scaled".cast("double").as("cosine")))
      .select($"q_id", $"rank", $"n_id",
        $"cosine".cast("long").as("score_scaled"),
        ($"cosine" / lit(BM25_SCALE.toDouble)).as("bm25"))
  }

  /** E4's quantization as a reusable transform over any
    * (vec_id, embedding) frame — row-local, engine-portable IEEE.
    * `passThrough` columns are carried into the projection. */
  /** The E4 int8 symmetric-quantization transform, single-sourced for
    * every consumer (E4's artifact key, E6's pipeline, E16's
    * compressed retriever): adds `scale` (max|x|/127, 1.0 for the
    * zero vector) and `q` (floor(x/scale + 0.5) as BIGINT) columns. */
  private def int8Columns(e: DataFrame): DataFrame =
    e.withColumn("m", expr(
        "aggregate(transform(embedding, x -> abs(CAST(x AS DOUBLE))), CAST(0 AS DOUBLE), (a, v) -> greatest(a, v))"))
      .withColumn("scale", when(col("m") === 0.0, lit(1.0)).otherwise(col("m") / 127.0))
      .withColumn("q", expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5d) AS BIGINT))"))

  private def quantized(e: DataFrame, passThrough: Seq[String] = Nil): DataFrame =
    int8Columns(e)
      .select(col("vec_id") +: passThrough.map(col) :+ col("scale") :+
        graft.text.TextOps.md5s(expr("array_join(q, ',')")).as("q_checksum") :+
        expr("""aggregate(
               |  zip_with(q, embedding, (qi, x) -> abs(qi * scale - CAST(x AS DOUBLE))),
               |  CAST(0 AS DOUBLE), (a, v) -> greatest(a, v))""".stripMargin)
          .as("max_abs_err"): _*)

  /** E3's coarse-quantizer assignment, shared with E20's IVF-PQ
    * composition: every corpus vector to its ONE nearest centroid
    * cell, every query to its `nprobe` nearest cells. Returns
    * (ccell(n_id, cell), qcell(q_id, cell)). */
  def ivfAssign(e0: DataFrame, nQueries: Int, nlist: Int,
                nprobe: Int): (DataFrame, DataFrame) = {
    val e = e0.withColumn("nrm", VectorOps.normDec("embedding"))
    val cents = e.filter(col("vec_id") < nlist)
      .select(col("vec_id").as("c_id"), col("embedding").as("ce"), col("nrm").as("cn"))
    def assign(side: DataFrame, idCol: String, kCells: Int): DataFrame =
      side.crossJoin(broadcast(cents))
        .withColumn("ccos",
          VectorOps.dotDecFast(col("ve"), col("ce")) / (col("vn") * col("cn")))
        .groupBy(col(idCol))
        .agg(graft.functions.GraftFunctions.topK(col("ccos"), col("c_id"), kCells).as("tk"))
        .select(col(idCol), explode(col("tk.id")).as("cell"))
    val ccell = assign(
      e.select(col("vec_id").as("n_id"), col("embedding").as("ve"), col("nrm").as("vn")),
      "n_id", 1)
    val qcell = assign(
      e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("ve"), col("nrm").as("vn")),
      "q_id", nprobe)
    (ccell, qcell)
  }

  /** IVF top-k over an embeddings DF (`vec_id`, `embedding`):
    * queries are vec_id < nQueries, centroids the deterministic first
    * `nlist` vectors. Shared by the `s_knn_ivf` query and the
    * clustered-data recall spec. */
  def ivfTopK(e0: DataFrame, nQueries: Int, nlist: Int, nprobe: Int, k: Int): DataFrame = {
    val e = e0.withColumn("nrm", VectorOps.normDec("embedding"))
    val (ccell, qcell) = ivfAssign(e0, nQueries, nlist, nprobe)
    val cand = qcell.join(ccell, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("nrm").as("qn"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("ne"), col("nrm").as("nn"))
    topK(cand.join(broadcast(q), "q_id").join(c, "n_id")
      .withColumn("cosine",
        VectorOps.dotDecFast(col("qe"), col("ne")) / (col("qn") * col("nn"))),
      k)
  }

  /** E5/E20's shared back half (second review pass — one pipeline,
    * not two divergable copies): PQ-encode every corpus vector from
    * the sub-distance table (min dist, tie → min code; exact integer
    * compare), evaluate ADC either over ALL query–corpus pairs
    * (`cand = None`, E5) or restricted to a candidate-pair set
    * (E20's probed cells), and rank the top K per query with the
    * bounded-heap topK (tie → min id). */
  private def pqAdcTopK(e: DataFrame, cand: Option[DataFrame],
                        k: Int = K): DataFrame = {
    val subDists = pqSubDists(e)
    val codes = subDists
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dst"), col("code"))).as("mn"))
      .select(col("vec_id").as("n_id"), col("m"), col("mn.code").as("code"))
    // ADC: query sub-distance lookup table, broadcast to the codes
    val qd = subDists.filter(col("vec_id") < N_QUERIES)
      .select(col("vec_id").as("q_id"), col("m"), col("code"), col("dst"))
    val adc = (cand match {
      case Some(c) => c.join(codes, "n_id")
        .join(broadcast(qd), Seq("q_id", "m", "code"))
      case None => codes.join(broadcast(qd), Seq("m", "code"))
        .filter(col("q_id") =!= col("n_id"))
    })
      .groupBy(col("q_id"), col("n_id"))
      .agg(sum(col("dst")).as("dist"))
    adc.groupBy(col("q_id"))
      .agg(graft.functions.GraftFunctions.topK(
        (-col("dist")).cast("double"), col("n_id"), k).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("n_id"), (-col("t.score") / lit(1e12)).as("adc_dist"))
  }

  /** E5's per-(vector, sub-space, codeword) exact quantized L2² table
    * in integer picos — the shared front half of PQ encode and the
    * query-side ADC lookup, reused by E20. */
  private def pqSubDists(e: DataFrame): DataFrame =
    e.crossJoin(broadcast(
        e.filter(col("vec_id") < PQ_NCODES)
          .select(col("vec_id").cast("int").as("code"), col("embedding").as("cbe"))))
      .select(col("vec_id"), col("code"),
        explode(sequence(lit(1), lit(PQ_M))).as("m"), col("embedding"), col("cbe"))
      .withColumn("dst", expr(
        s"""aggregate(
           |  zip_with(slice(embedding, (m-1)*$PQ_SUBDIM + 1, $PQ_SUBDIM),
           |           slice(cbe, (m-1)*$PQ_SUBDIM + 1, $PQ_SUBDIM),
           |    (x, y) -> CAST(floor((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))
           |      * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * 1e12 + 0.5) AS BIGINT)),
           |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin))
      .select(col("vec_id"), col("m"), col("code"), col("dst"))

  /** E17's lexical CTE chain, single-sourced for the s_bm25 and
    * s_rrf_hybrid oracles: ends in `lexranked(q_id, n_id,
    * score_scaled, rank)`. Tokenization is [[graft.text.TextOps.nrmSql]]
    * (the F-family's normalization twin); the per-term score is
    * [[bm25TermSql]] VERBATIM — the same string the Spark plan
    * compiles, so the IEEE tree cannot drift between engines. */
  private def bm25OracleCtes: String =
    s"""toks AS (SELECT doc_id, UNNEST(string_split(${graft.text.TextOps.nrmSql}, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
       |dln AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |st AS (SELECT nd.n_docs, CAST(tt.total_toks AS DOUBLE) / CAST(nd.n_docs AS DOUBLE) AS avgdl
       |       FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents) nd,
       |            (SELECT CAST(SUM(tf) AS BIGINT) AS total_toks FROM tf) tt),
       |qt AS (SELECT q_id, term, df FROM (
       |        SELECT t.doc_id AS q_id, t.term, f.df,
       |         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY f.df ASC, t.term ASC) AS trank
       |        FROM tf t JOIN dfreq f USING (term) WHERE t.doc_id < $N_QUERIES)
       |       WHERE trank <= $QTERM_BUDGET),
       |cand AS (SELECT q.q_id, t.doc_id AS n_id, t.tf, q.df, d.dl, st.n_docs, st.avgdl
       |         FROM qt q JOIN tf t ON t.term = q.term AND t.doc_id <> q.q_id
       |          JOIN dln d ON d.doc_id = t.doc_id, st),
       |lexscored AS (SELECT q_id, n_id, $bm25TermSql AS term_scaled FROM cand),
       |lexagg AS (SELECT q_id, n_id, CAST(SUM(term_scaled) AS BIGINT) AS score_scaled
       |           FROM lexscored GROUP BY 1, 2),
       |lexranked AS (SELECT q_id, n_id, score_scaled,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score_scaled DESC, n_id ASC) AS BIGINT) AS rank
       |   FROM lexagg)""".stripMargin

  /** Shared oracle CTEs for dims / norms. */
  /** The E4 scale CTE (`sc`), single-sourced for the s_quantize and
    * s_rrf oracles — assumes a `dims(vec_id, i, x)` CTE in scope. */
  private val int8ScaleSql =
    """sc AS (SELECT vec_id, CASE WHEN MAX(ABS(x)) = 0 THEN 1.0 ELSE MAX(ABS(x)) / 127.0 END AS scale
      |       FROM dims GROUP BY vec_id)""".stripMargin

  private val dimsSql =
    """dims AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      |         FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |nrm AS (SELECT vec_id, sqrt(CAST(SUM(CAST(x*x AS DECIMAL(28,12))) AS DOUBLE)) AS n
      |        FROM dims GROUP BY vec_id)""".stripMargin

  /** E3's coarse-cell CTE chain (expects `dims`/`nrm` in scope):
    * ends in `ccell(n_id, cell)` and `qcell(q_id, cell)` — shared by
    * the s_knn_ivf and s_knn_ivfpq oracles. */
  private val ivfCellSql: String =
    s"""adot AS (SELECT v.vec_id AS vid, k.vec_id AS cid,
       |          CAST(SUM(CAST(floor(v.x * k.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
       |         FROM dims v JOIN dims k ON k.i = v.i AND k.vec_id < $NLIST
       |         GROUP BY v.vec_id, k.vec_id),
       |acos AS (SELECT a.vid, a.cid, a.dp / (nv.n * nc.n) AS c
       |         FROM adot a JOIN nrm nv ON nv.vec_id = a.vid JOIN nrm nc ON nc.vec_id = a.cid),
       |ranked_cells AS (SELECT vid, cid,
       |                  ROW_NUMBER() OVER (PARTITION BY vid ORDER BY c DESC, cid ASC) AS rn
       |                 FROM acos),
       |ccell AS (SELECT vid AS n_id, cid AS cell FROM ranked_cells WHERE rn = 1),
       |qcell AS (SELECT vid AS q_id, cid AS cell FROM ranked_cells
       |          WHERE vid < $N_QUERIES AND rn <= $NPROBE)""".stripMargin

  /** E5's codebook/encode CTE chain (expects `dims` in scope): ends
    * in `sd(vec_id, code, m, dst)` and `enc(n_id, m, code)` — shared
    * by the s_knn_pq and s_knn_ivfpq oracles. */
  private val pqEncSql: String =
    s"""cb AS (SELECT vec_id AS code, i, x FROM dims WHERE vec_id < $PQ_NCODES),
       |sd AS (
       | SELECT v.vec_id, c.code, (v.i - 1) // $PQ_SUBDIM + 1 AS m,
       |  SUM(CAST(floor((v.x - c.x) * (v.x - c.x) * 1e12 + 0.5) AS BIGINT)) AS dst
       | FROM dims v JOIN cb c ON c.i = v.i
       | GROUP BY v.vec_id, c.code, (v.i - 1) // $PQ_SUBDIM + 1),
       |enc AS (
       | SELECT vec_id AS n_id, m, code FROM sd
       | QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dst ASC, code ASC) = 1)""".stripMargin

  /** Shared unrolled-Lloyd's oracle CTEs ending in `kasg`
    * (vec_id, cluster_id, dist2) — consumed by the s_kmeans and
    * s_inertia oracles, which must evaluate the SAME clustering. */
  private def kmeansOracleCtes(): String = {
    val steps = (1 to KM_ITERS).map { it =>
      s"""a$it AS (
         | SELECT d.vec_id, c.cid,
         |  CAST(SUM(CAST((d.x - c.c)*(d.x - c.c) AS DECIMAL(28,12))) AS DOUBLE) AS d2
         | FROM kdims d JOIN c${it - 1} c ON c.i = d.i GROUP BY d.vec_id, c.cid),
         |a${it}b AS (
         | SELECT vec_id, cid FROM a$it
         | QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1),
         |c$it AS (
         | SELECT a.cid, d.i, CAST(SUM(CAST(d.x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS c
         | FROM kdims d JOIN a${it}b a ON a.vec_id = d.vec_id GROUP BY a.cid, d.i)"""
    }.mkString(",\n")
    s"""kdims AS (
       | SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       | FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
       |c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, i, x AS c FROM kdims WHERE vec_id < $KM_K),
       |$steps,
       |fin AS (
       | SELECT d.vec_id, c.cid,
       |  CAST(SUM(CAST((d.x - c.c)*(d.x - c.c) AS DECIMAL(28,12))) AS DOUBLE) AS d2
       | FROM kdims d JOIN c$KM_ITERS c ON c.i = d.i GROUP BY d.vec_id, c.cid),
       |kasg AS (
       | SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, round(d2, 6) AS dist2
       | FROM fin
       | QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cid ASC) = 1)""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "s_recall" -> {
      val width = PLANES / BANDS
      s"""WITH $dimsSql,
         |proj AS (
         | SELECT vec_id, j,
         |  CASE WHEN SUM(CAST(floor((CASE WHEN substr(md5(j || '_' || i), 1, 1) < '8' THEN x ELSE -x END) * 1e12 + 0.5) AS BIGINT)) >= 0
         |   THEN '1' ELSE '0' END AS bit
         | FROM dims, UNNEST(range(1, ${PLANES + 1})) tj(j) GROUP BY vec_id, j),
         |sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY j) AS sg FROM proj GROUP BY vec_id),
         |bands AS (SELECT vec_id, b, substr(sg, (b-1)*$width + 1, $width) AS bv
         |          FROM sig, UNNEST(range(1, ${BANDS + 1})) tb(b)),
         |canda AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
         |          FROM bands q JOIN bands c ON q.b = c.b AND q.bv = c.bv AND q.vec_id <> c.vec_id
         |          WHERE q.vec_id < $N_QUERIES),
         |dota AS (SELECT cd.q_id, cd.n_id, CAST(SUM(CAST(floor(dq.x * dc.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |         FROM canda cd JOIN dims dq ON dq.vec_id = cd.q_id
         |          JOIN dims dc ON dc.vec_id = cd.n_id AND dc.i = dq.i
         |         GROUP BY cd.q_id, cd.n_id),
         |ranka AS (SELECT d.q_id, d.n_id,
         |           ROW_NUMBER() OVER (PARTITION BY d.q_id
         |             ORDER BY d.dp / (nq.n * nc.n) DESC, d.n_id ASC) AS rank
         |          FROM dota d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |dotb AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |          CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |         FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |         WHERE q.vec_id < $N_QUERIES
         |         GROUP BY q.vec_id, c.vec_id),
         |rankb AS (SELECT d.q_id, d.n_id,
         |           ROW_NUMBER() OVER (PARTITION BY d.q_id
         |             ORDER BY d.dp / (nq.n * nc.n) DESC, d.n_id ASC) AS rank
         |          FROM dotb d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |hits AS (SELECT b.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |         FROM rankb b JOIN ranka a ON a.q_id = b.q_id AND a.n_id = b.n_id
         |         WHERE b.rank <= $K AND a.rank <= $K GROUP BY 1),
         |qs AS (SELECT DISTINCT q_id FROM rankb)
         |SELECT q.q_id, COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
         | CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $K.0 AS recall
         |FROM qs q LEFT JOIN hits h USING (q_id)""".stripMargin
    },
    "s_matryoshka" ->
      s"""WITH $dimsSql,
         |lens AS (SELECT vec_id, MAX(i) AS dlen FROM dims GROUP BY 1),
         |tdims AS (SELECT d.vec_id, d.i, d.x FROM dims d JOIN lens l USING (vec_id)
         |          WHERE d.i <= l.dlen // 2),
         |tnrm AS (SELECT vec_id, sqrt(CAST(SUM(CAST(x*x AS DECIMAL(28,12))) AS DOUBLE)) AS n
         |         FROM tdims GROUP BY vec_id),
         |tdot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |          CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |         FROM tdims q JOIN tdims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |         WHERE q.vec_id < $N_QUERIES
         |         GROUP BY q.vec_id, c.vec_id),
         |tranked AS (SELECT d.q_id, d.n_id,
         |             ROW_NUMBER() OVER (PARTITION BY d.q_id
         |               ORDER BY d.dp / (nq.n * nc.n) DESC, d.n_id ASC) AS rank
         |            FROM tdot d JOIN tnrm nq ON nq.vec_id = d.q_id JOIN tnrm nc ON nc.vec_id = d.n_id),
         |fdot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |          CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |         FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |         WHERE q.vec_id < $N_QUERIES
         |         GROUP BY q.vec_id, c.vec_id),
         |franked AS (SELECT d.q_id, d.n_id,
         |             ROW_NUMBER() OVER (PARTITION BY d.q_id
         |               ORDER BY d.dp / (nq.n * nc.n) DESC, d.n_id ASC) AS rank
         |            FROM fdot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |hits AS (SELECT f.q_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |         FROM franked f JOIN tranked t ON t.q_id = f.q_id AND t.n_id = f.n_id
         |         WHERE f.rank <= $K AND t.rank <= $K GROUP BY 1),
         |qs AS (SELECT DISTINCT q_id FROM franked)
         |SELECT q.q_id, COALESCE(h.n_hits, CAST(0 AS BIGINT)) AS n_hits,
         | CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / $K.0 AS recall
         |FROM qs q LEFT JOIN hits h USING (q_id)""".stripMargin,
    "s_knn_join" -> {
      val width = PLANES / KNN_JOIN_BANDS
      s"""WITH $dimsSql,
         |proj AS (
         | SELECT vec_id, j,
         |  CASE WHEN SUM(CAST(floor((CASE WHEN substr(md5(j || '_' || i), 1, 1) < '8' THEN x ELSE -x END) * 1e12 + 0.5) AS BIGINT)) >= 0
         |   THEN '1' ELSE '0' END AS bit
         | FROM dims, UNNEST(range(1, ${PLANES + 1})) tj(j) GROUP BY vec_id, j),
         |sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY j) AS sg FROM proj GROUP BY vec_id),
         |bands AS (SELECT vec_id, b, substr(sg, (b-1)*$width + 1, $width) AS bv
         |          FROM sig, UNNEST(range(1, ${KNN_JOIN_BANDS + 1})) tb(b)),
         |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
         |         FROM bands q JOIN bands c ON q.b = c.b AND q.bv = c.bv AND q.vec_id <> c.vec_id),
         |dot AS (SELECT cd.q_id, cd.n_id, CAST(SUM(CAST(floor(dq.x * dc.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM cand cd JOIN dims dq ON dq.vec_id = cd.q_id
         |         JOIN dims dc ON dc.vec_id = cd.n_id AND dc.i = dq.i
         |        GROUP BY cd.q_id, cd.n_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranked AS (SELECT q_id, n_id, cosine,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM cosv)
         |SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= $KNN_JOIN_K""".stripMargin
    },
    "s_maxsim" ->
      s"""WITH $dimsSql,
         |dot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM dims q JOIN dims c ON q.i = c.i
         |        WHERE q.vec_id < $MAXSIM_QVECS
         |        GROUP BY q.vec_id, c.vec_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id
         |          JOIN nrm nc ON nc.vec_id = d.n_id),
         |qm AS (SELECT n_id // $MAXSIM_DOC_W AS doc_id, q_id,
         |        MAX(CAST(floor(cosine * 1e9 + 0.5) AS BIGINT)) AS qmax
         |       FROM cosv GROUP BY 1, 2),
         |sc AS (SELECT doc_id, CAST(CAST(SUM(qmax) AS BIGINT) AS DOUBLE) / 1e9 AS score
         |       FROM qm GROUP BY 1),
         |ranked AS (SELECT doc_id, score,
         |            CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
         |           FROM sc)
         |SELECT rank, doc_id, score FROM ranked WHERE rank <= $MAXSIM_TOPK""".stripMargin,
    "s_range_search" ->
      s"""WITH $dimsSql,
         |dot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |        WHERE q.vec_id < $N_QUERIES
         |        GROUP BY q.vec_id, c.vec_id)
         |SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id
         |WHERE d.dp / (nq.n * nc.n) >= $RANGE_MIN_COSINE""".stripMargin,
    // E12: hamming recomputed from per-dimension sign disagreements
    // (no bit packing in SQL — the packed-signature arithmetic is
    // verified through the distances), then the exact-cosine re-rank
    // over the same (hamming ASC, n_id) shortlist
    "s_knn_binary" ->
      s"""WITH $dimsSql,
         |ham AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CASE WHEN (q.x > 0) <> (c.x > 0) THEN 1 ELSE 0 END) AS BIGINT) AS hamming
         |        FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |        WHERE q.vec_id < $N_QUERIES
         |        GROUP BY 1, 2),
         |sel AS (SELECT q_id, n_id, hamming FROM (
         |         SELECT q_id, n_id, hamming,
         |          ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming ASC, n_id ASC) AS r
         |         FROM ham) WHERE r <= $BQ_RERANK),
         |dot AS (SELECT s.q_id, s.n_id, s.hamming,
         |         CAST(SUM(CAST(floor(dq.x * dc.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM sel s
         |        JOIN dims dq ON dq.vec_id = s.q_id
         |        JOIN dims dc ON dc.vec_id = s.n_id AND dc.i = dq.i
         |        GROUP BY 1, 2, 3),
         |cosv AS (SELECT d.q_id, d.n_id, d.hamming, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranked AS (SELECT q_id, n_id, hamming, cosine,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM cosv)
         |SELECT q_id, rank, n_id, hamming, cosine FROM ranked WHERE rank <= $K""".stripMargin,
    "s_knn_filtered" ->
      s"""WITH $dimsSql,
         |dot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |        WHERE q.vec_id < $N_QUERIES AND c.vec_id % 5 = 0
         |        GROUP BY q.vec_id, c.vec_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranked AS (SELECT q_id, n_id, cosine,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM cosv)
         |SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= $K""".stripMargin,
    "s_knn_brute" ->
      s"""WITH $dimsSql,
         |dot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |        WHERE q.vec_id < $N_QUERIES
         |        GROUP BY q.vec_id, c.vec_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranked AS (SELECT q_id, n_id, cosine,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM cosv)
         |SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= $K""".stripMargin,
    // E16: both retrievers re-derived independently — retriever A is
    // the s_knn_brute oracle verbatim, retriever B re-quantizes per
    // E4's scheme (exact integer dot, one IEEE rescale per candidate)
    // — then the fusion is pure BIGINT arithmetic on the ranks.
    "s_rrf" ->
      s"""WITH $dimsSql,
         |dot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |        WHERE q.vec_id < $N_QUERIES
         |        GROUP BY q.vec_id, c.vec_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranka AS (SELECT q_id, n_id, rank_cos FROM (
         |           SELECT q_id, n_id,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank_cos
         |           FROM cosv) WHERE rank_cos <= $K),
         |$int8ScaleSql,
         |qd AS (SELECT d.vec_id, d.i, CAST(floor(d.x / s.scale + 0.5) AS BIGINT) AS qx
         |       FROM dims d JOIN sc s USING (vec_id)),
         |idot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id, SUM(q.qx * c.qx) AS di
         |         FROM qd q JOIN qd c ON q.i = c.i AND q.vec_id <> c.vec_id
         |         WHERE q.vec_id < $N_QUERIES
         |         GROUP BY q.vec_id, c.vec_id),
         |rankb AS (SELECT q_id, n_id, rank_int8 FROM (
         |           SELECT d.q_id, d.n_id,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY d.q_id
         |              ORDER BY CAST(d.di AS DOUBLE) * s.scale DESC, d.n_id ASC) AS BIGINT) AS rank_int8
         |           FROM idot d JOIN sc s ON s.vec_id = d.n_id) WHERE rank_int8 <= $K),
         |fused AS (
         | SELECT COALESCE(a.q_id, b.q_id) AS q_id, COALESCE(a.n_id, b.n_id) AS n_id,
         |        a.rank_cos, b.rank_int8,
         |        COALESCE(CAST(floor(1e12 / ($RRF_C + a.rank_cos)) AS BIGINT), 0)
         |         + COALESCE(CAST(floor(1e12 / ($RRF_C + b.rank_int8)) AS BIGINT), 0) AS rrf_scaled
         | FROM ranka a FULL OUTER JOIN rankb b ON a.q_id = b.q_id AND a.n_id = b.n_id)
         |SELECT q_id, fused_rank, n_id, rank_cos, rank_int8, rrf_scaled FROM (
         | SELECT q_id, n_id, rank_cos, rank_int8, rrf_scaled,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rrf_scaled DESC, n_id ASC) AS BIGINT) AS fused_rank
         | FROM fused) WHERE fused_rank <= $K""".stripMargin,
    // E17: the lexical chain re-derived from the raw documents table
    // (tokenize → postings → df/dl/corpus stats → pruned query terms
    // → inverted-index join → fixed-point term sum → rank).
    "s_bm25" ->
      s"""WITH $bm25OracleCtes
         |SELECT q_id, rank, n_id, score_scaled,
         | CAST(score_scaled AS DOUBLE) / 1000000.0 AS bm25
         |FROM lexranked WHERE rank <= $K""".stripMargin,
    // E18: retriever A is the s_knn_brute oracle verbatim (dense
    // cosine), retriever B is E17's lexical chain verbatim; the
    // fusion is the same pure-BIGINT arithmetic as E16's.
    "s_rrf_hybrid" ->
      s"""WITH $dimsSql,
         |dot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |        WHERE q.vec_id < $N_QUERIES
         |        GROUP BY q.vec_id, c.vec_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranka AS (SELECT q_id, n_id, rank_cos FROM (
         |           SELECT q_id, n_id,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank_cos
         |           FROM cosv) WHERE rank_cos <= $K),
         |$bm25OracleCtes,
         |rankl AS (SELECT q_id, n_id, rank AS rank_lex FROM lexranked WHERE rank <= $K),
         |fused AS (
         | SELECT COALESCE(a.q_id, b.q_id) AS q_id, COALESCE(a.n_id, b.n_id) AS n_id,
         |        a.rank_cos, b.rank_lex,
         |        COALESCE(CAST(floor(1e12 / ($RRF_C + a.rank_cos)) AS BIGINT), 0)
         |         + COALESCE(CAST(floor(1e12 / ($RRF_C + b.rank_lex)) AS BIGINT), 0) AS rrf_scaled
         | FROM ranka a FULL OUTER JOIN rankl b ON a.q_id = b.q_id AND a.n_id = b.n_id)
         |SELECT q_id, fused_rank, n_id, rank_cos, rank_lex, rrf_scaled FROM (
         | SELECT q_id, n_id, rank_cos, rank_lex, rrf_scaled,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rrf_scaled DESC, n_id ASC) AS BIGINT) AS fused_rank
         | FROM fused) WHERE fused_rank <= $K""".stripMargin,
    // E19: pool + pairwise sims re-derived from dims (the E1 dot
    // contract), then the greedy unrolled — pick_t = argmax of
    // 0.7·rel − 0.3·max-sim-to-selected over the not-yet-selected
    // pool, exactly K steps.
    "s_mmr" -> {
      val steps = (2 to K).map { t =>
        val prev = s"all${t - 1}"
        s"""pick$t AS (SELECT q_id, n_id, rel, max_sim, mmr FROM (
           | SELECT q_id, n_id, rel, max_sim, mmr,
           |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY mmr DESC, n_id ASC) AS BIGINT) AS rk
           | FROM (
           |  SELECT p.q_id, p.n_id, p.rel, m.max_sim,
           |   0.7 * p.rel - 0.3 * m.max_sim AS mmr
           |  FROM pool p
           |  JOIN (SELECT s.q_id, s.a_id, MAX(s.sim) AS max_sim
           |        FROM sims s JOIN $prev u ON u.q_id = s.q_id AND u.n_id = s.b_id
           |        GROUP BY 1, 2) m ON m.q_id = p.q_id AND m.a_id = p.n_id
           |  WHERE NOT EXISTS (SELECT 1 FROM $prev u2
           |                    WHERE u2.q_id = p.q_id AND u2.n_id = p.n_id)))
           | WHERE rk = 1),
           |all$t AS (SELECT q_id, n_id, mmr_rank, rel, max_sim, mmr FROM $prev
           |          UNION ALL
           |          SELECT q_id, n_id, CAST($t AS BIGINT), rel, max_sim, mmr FROM pick$t)"""
      }.mkString(",\n")
      s"""WITH $dimsSql,
         |dot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |        WHERE q.vec_id < $N_QUERIES
         |        GROUP BY q.vec_id, c.vec_id),
         |pool AS (SELECT q_id, n_id, rel FROM (
         |          SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS rel,
         |           CAST(ROW_NUMBER() OVER (PARTITION BY d.q_id
         |             ORDER BY d.dp / (nq.n * nc.n) DESC, d.n_id ASC) AS BIGINT) AS rk
         |          FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id
         |           JOIN nrm nc ON nc.vec_id = d.n_id)
         |         WHERE rk <= $MMR_POOL),
         |pdot AS (SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
         |          CAST(SUM(CAST(floor(da.x * db.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |         FROM pool a JOIN pool b ON b.q_id = a.q_id AND b.n_id <> a.n_id
         |          JOIN dims da ON da.vec_id = a.n_id
         |          JOIN dims db ON db.vec_id = b.n_id AND db.i = da.i
         |         GROUP BY 1, 2, 3),
         |sims AS (SELECT p.q_id, p.a_id, p.b_id, p.dp / (na.n * nb.n) AS sim
         |         FROM pdot p JOIN nrm na ON na.vec_id = p.a_id
         |          JOIN nrm nb ON nb.vec_id = p.b_id),
         |all1 AS (SELECT q_id, n_id, CAST(1 AS BIGINT) AS mmr_rank, rel,
         |          CAST(0.0 AS DOUBLE) AS max_sim,
         |          0.7 * rel - 0.3 * CAST(0.0 AS DOUBLE) AS mmr
         |         FROM (SELECT q_id, n_id, rel,
         |                CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel DESC, n_id ASC) AS BIGINT) AS rk
         |               FROM pool)
         |         WHERE rk = 1),
         |$steps
         |SELECT q_id, mmr_rank, n_id, rel, max_sim, mmr FROM all$K""".stripMargin
    },
    "s_knn_ann" -> {
      val width = PLANES / BANDS
      s"""WITH $dimsSql,
         |proj AS (
         | SELECT vec_id, j,
         |  CASE WHEN SUM(CAST(floor((CASE WHEN substr(md5(j || '_' || i), 1, 1) < '8' THEN x ELSE -x END) * 1e12 + 0.5) AS BIGINT)) >= 0
         |   THEN '1' ELSE '0' END AS bit
         | FROM dims, UNNEST(range(1, ${PLANES + 1})) tj(j) GROUP BY vec_id, j),
         |sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY j) AS sg FROM proj GROUP BY vec_id),
         |bands AS (SELECT vec_id, b, substr(sg, (b-1)*$width + 1, $width) AS bv
         |          FROM sig, UNNEST(range(1, ${BANDS + 1})) tb(b)),
         |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
         |         FROM bands q JOIN bands c ON q.b = c.b AND q.bv = c.bv AND q.vec_id <> c.vec_id
         |         WHERE q.vec_id < $N_QUERIES),
         |dot AS (SELECT cd.q_id, cd.n_id, CAST(SUM(CAST(floor(dq.x * dc.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM cand cd JOIN dims dq ON dq.vec_id = cd.q_id
         |         JOIN dims dc ON dc.vec_id = cd.n_id AND dc.i = dq.i
         |        GROUP BY cd.q_id, cd.n_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranked AS (SELECT q_id, n_id, cosine,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM cosv)
         |SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= $K""".stripMargin
    },
    "s_knn_ivf" ->
      s"""WITH $dimsSql,
         |$ivfCellSql,
         |cand AS (SELECT q.q_id, c.n_id FROM qcell q JOIN ccell c USING (cell)
         |         WHERE q.q_id <> c.n_id),
         |dot AS (SELECT cd.q_id, cd.n_id, CAST(SUM(CAST(floor(dq.x * dc.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM cand cd JOIN dims dq ON dq.vec_id = cd.q_id
         |         JOIN dims dc ON dc.vec_id = cd.n_id AND dc.i = dq.i
         |        GROUP BY cd.q_id, cd.n_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranked AS (SELECT q_id, n_id, cosine,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM cosv)
         |SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= $K""".stripMargin,
    "s_knn_pq" ->
      s"""WITH dims AS (
         | SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
         | FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
         |$pqEncSql,
         |adc AS (
         | SELECT q.vec_id AS q_id, e.n_id, SUM(q.dst) AS dist
         | FROM enc e JOIN sd q ON q.m = e.m AND q.code = e.code
         | WHERE q.vec_id < $N_QUERIES AND q.vec_id <> e.n_id
         | GROUP BY q.vec_id, e.n_id),
         |ranked AS (
         | SELECT q_id, n_id, dist,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist ASC, n_id ASC) AS BIGINT) AS rank
         | FROM adc)
         |SELECT q_id, rank, n_id, CAST(dist AS DOUBLE) / 1e12 AS adc_dist
         |FROM ranked WHERE rank <= $K""".stripMargin,
    // E20: the two shared chains composed — ADC evaluated only over
    // candidate pairs from the probed cells.
    "s_knn_ivfpq" ->
      s"""WITH $dimsSql,
         |$ivfCellSql,
         |$pqEncSql,
         |cand AS (SELECT q.q_id, c.n_id FROM qcell q JOIN ccell c USING (cell)
         |         WHERE q.q_id <> c.n_id),
         |adc AS (
         | SELECT cd.q_id, cd.n_id, SUM(q.dst) AS dist
         | FROM cand cd JOIN enc e ON e.n_id = cd.n_id
         |  JOIN sd q ON q.vec_id = cd.q_id AND q.m = e.m AND q.code = e.code
         | GROUP BY cd.q_id, cd.n_id),
         |ranked AS (
         | SELECT q_id, n_id, dist,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist ASC, n_id ASC) AS BIGINT) AS rank
         | FROM adc)
         |SELECT q_id, rank, n_id, CAST(dist AS DOUBLE) / 1e12 AS adc_dist
         |FROM ranked WHERE rank <= $K""".stripMargin,
    // E21: the E20 chain verbatim up to the ADC ranking, shortlist
    // PQ_RERANK, then the s_knn_brute cosine formula restricted to
    // the shortlist pairs — the same exact-integer dot both engines
    // compute.
    "s_knn_ivfpq_r" ->
      s"""WITH $dimsSql,
         |$ivfCellSql,
         |$pqEncSql,
         |cand AS (SELECT q.q_id, c.n_id FROM qcell q JOIN ccell c USING (cell)
         |         WHERE q.q_id <> c.n_id),
         |adc AS (
         | SELECT cd.q_id, cd.n_id, SUM(q.dst) AS dist
         | FROM cand cd JOIN enc e ON e.n_id = cd.n_id
         |  JOIN sd q ON q.vec_id = cd.q_id AND q.m = e.m AND q.code = e.code
         | GROUP BY cd.q_id, cd.n_id),
         |short AS (
         | SELECT q_id, n_id FROM (
         |  SELECT q_id, n_id,
         |   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY dist ASC, n_id ASC) AS r
         |  FROM adc) WHERE r <= $PQ_RERANK),
         |dot AS (
         | SELECT s.q_id, s.n_id,
         |  CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         | FROM short s
         |  JOIN dims q ON q.vec_id = s.q_id
         |  JOIN dims c ON c.vec_id = s.n_id AND c.i = q.i
         | GROUP BY s.q_id, s.n_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id
         |          JOIN nrm nc ON nc.vec_id = d.n_id),
         |rranked AS (SELECT q_id, n_id, cosine,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         | FROM cosv)
         |SELECT q_id, rank, n_id, cosine FROM rranked WHERE rank <= $K""".stripMargin,
    "s_pipeline" ->
      s"""WITH ${graft.dedup.DedupPack.semanticSqlCtes},
         |kept AS (
         | SELECT vec_id, cluster_id FROM flagged WHERE (NOT dup) OR rn = 1),
         |dims AS (
         | SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
         | FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
         |sc AS (SELECT vec_id, CASE WHEN MAX(ABS(x)) = 0 THEN 1.0 ELSE MAX(ABS(x)) / 127.0 END AS scale
         |       FROM dims GROUP BY vec_id),
         |q AS (SELECT d.vec_id, d.i, s.scale,
         |       CAST(floor(d.x / s.scale + 0.5) AS BIGINT) AS qi, d.x
         |      FROM dims d JOIN sc s ON s.vec_id = d.vec_id)
         |SELECT q.vec_id, ANY_VALUE(k.cluster_id) AS cluster_id, ANY_VALUE(q.scale) AS scale,
         | md5(string_agg(CAST(qi AS VARCHAR), ',' ORDER BY i)) AS q_checksum,
         | MAX(ABS(qi * scale - x)) AS max_abs_err
         |FROM q JOIN kept k ON k.vec_id = q.vec_id
         |GROUP BY q.vec_id""".stripMargin,
    "s_kmeans" -> s"""WITH ${kmeansOracleCtes()}
                      |SELECT vec_id, cluster_id, dist2 FROM kasg""".stripMargin,
    "s_inertia" ->
      s"""WITH ${kmeansOracleCtes()},
         |per AS (
         | SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_vectors,
         |  CAST(SUM(CAST(dist2 AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS sse
         | FROM kasg GROUP BY cluster_id),
         |tot AS (SELECT CAST(SUM(sse) AS DECIMAL(38,6)) AS sse_total FROM per)
         |SELECT p.cluster_id, p.n_vectors,
         | CAST(p.sse AS DOUBLE) AS inertia,
         | CAST(p.sse AS DOUBLE) / CAST(t.sse_total AS DOUBLE) AS inertia_share
         |FROM per p CROSS JOIN tot t""".stripMargin,
    "s_quantize" ->
      s"""WITH dims AS (
        | SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
        | FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
        |$int8ScaleSql,
        |q AS (SELECT d.vec_id, d.i, s.scale,
        |       CAST(floor(d.x / s.scale + 0.5) AS BIGINT) AS qi, d.x
        |      FROM dims d JOIN sc s ON s.vec_id = d.vec_id)
        |SELECT vec_id, ANY_VALUE(scale) AS scale,
        | md5(string_agg(CAST(qi AS VARCHAR), ',' ORDER BY i)) AS q_checksum,
        | MAX(ABS(qi * scale - x)) AS max_abs_err
        |FROM q GROUP BY vec_id""".stripMargin,
  )
}
