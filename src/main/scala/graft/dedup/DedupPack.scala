package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.text.TextOps

/** Deduplication pack (SURVEY §2 D1–D5) — the LLM-data-pipeline
  * dedup mandate over the `documents` / `embeddings` tables.
  *
  * Conceptual seed in the reference: INSERT-OR-IGNORE identity dedup
  * (main.py:203) and pairwise set-similarity over hash sets
  * (mcs.py:285-336 — Tanimoto of subgraph hashes is exactly n-gram
  * Jaccard with graph shingles). Here the same ideas run at corpus
  * scale with the standard sketching tricks.
  *
  * Scale design (graded — SURVEY §5): nothing here is all-pairs, and
  * every signature is computed MAP-SIDE in one pass per document
  * ([[Signatures]]) — the only shuffles left are the band-bucket
  * joins themselves.
  *   - MinHash: per-doc k-min signature, then LSH banding turns
  *     candidate generation into an equi-join on (band, band-value) —
  *     O(Σ bucket²), not O(n²).
  *   - SimHash: per-doc 64-bit tf-weighted signature; candidate pairs
  *     come from 16-bit chunk blocking (pigeonhole: hamming ≤ 3 ⇒
  *     some chunk of 16 equal).
  *   - n-gram Jaccard: candidates blocked on *rare* shingles
  *     (document frequency ≤ 20), capping join fan-out per shingle —
  *     the skew-resistant verify join.
  *   - Embedding near-dup: random-hyperplane LSH (deterministic
  *     md5-sign hyperplanes) bands vectors into buckets; cosine is
  *     only computed within buckets.
  *
  * Determinism contract: every hash is md5-hex (identical UTF-8
  * semantics in Spark and DuckDB); min-hash ordering is lexicographic
  * on hex strings; all floating sums that feed a comparison follow
  * the engine-wide quantization contract (floor(term·1e12 + 0.5)
  * longs, exact 64-bit sums — order-free), so both engines produce
  * bit-identical doubles.
  */
object DedupPack extends QueryPack {

  private val MINHASH_K = 16
  private val MINHASH_BANDS = 4
  private val MINHASH_ROWS = 4
  // D9's estimator-accuracy guarantee: |sig-agreement/k − exact J| ≤
  // 0.35 ≈ 2.8σ at the k=16 worst case (σ = √(J(1−J)/k) ≤ 0.125).
  // Calibrated against the data: max observed error is 0.082 at
  // sf0.01 and 0.238 at sf0.1 across all LSH candidate pairs, so the
  // bound holds with ~1σ margin at both driver scales (same
  // calibration discipline as g_anf's register bound — the booleans
  // are deterministic given the fixed corpus, not a tail gamble).
  private val MINHASH_EST_BOUND = 0.35
  private val SIMHASH_BITS = 64
  // 4 chunks of 16 bits: pigeonhole-complete for hamming ≤ 3, and the
  // 16-bit chunk keys keep buckets tiny (185k candidate pairs at
  // sf0.1 vs 4.0M with 8-bit chunks — measured via the oracle shape).
  private val SIMHASH_CHUNKS = 4
  private val SIMHASH_CHUNK_W = SIMHASH_BITS / SIMHASH_CHUNKS
  private val SIMHASH_MAX_HAMMING = 3
  private val NGRAM_MAX_DF = 20
  // Candidates must share ≥ 2 rare shingles: a single shared shingle
  // is mostly coincidence on a small vocabulary (1.1M pairs at sf0.1);
  // two shared rare shingles prune that to 110k while true near-dups
  // share dozens.
  private val NGRAM_MIN_COMMON = 2
  private val NGRAM_MIN_JACCARD = 0.5
  // D8: emit pairs whose smaller shingle set is ≥ 80% inside the other
  private val CONTAIN_MIN = 0.8
  // D13: sorted-neighborhood window (compare rows ≤ 3 positions apart
  // in the global sort-key order) and the sort-key prefix length
  private val SNM_WINDOW = 4
  private val SNM_KEY_LEN = 24
  private val EMBED_PLANES = 16
  private val EMBED_BANDS = 4
  private val EMBED_MIN_COSINE = 0.35
  // D7 semantic dedup: deterministic seed centroids (the K lowest
  // vec_ids) and the keep/drop cosine threshold (p95 of the
  // cosine-to-assigned-centroid distribution on this corpus).
  private val SEM_K = 8
  private val SEM_TAU = 0.3
  // D14 substring dedup: a span is "duplicated" when a verbatim run of
  // at least SUBSTR_K tokens also appears in another document.
  private val SUBSTR_K = 8
  // D11 block-size cap (round 14): a primary block larger than this
  // re-blocks through the secondary rung, keeping per-block pairwise
  // work bounded even when the primary key domain saturates. Above
  // every block observed at the shipped SFs (max 57), so the rail is
  // data-inert there and pinned by its own spec fixture.
  private val ER_BLOCK_CAP = 128

  /** All ordered (a < b) pairs of a bucket's doc ids — the
    * within-bucket candidate enumeration. Bucket size is capped by
    * the rare-shingle document-frequency bound, so the quadratic is
    * bounded per bucket. */
  private val bucketPairs: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { ds: Seq[Long] =>
      val a = ds.toArray.sorted
      val out = Seq.newBuilder[(Long, Long)]
      var i = 0
      while (i < a.length) {
        var j = i + 1
        while (j < a.length) {
          if (a(i) != a(j)) out += ((a(i), a(j)))
          j += 1
        }
        i += 1
      }
      out.result()
    }


  /** D4/D8's shared candidate machinery: per-doc sorted distinct
    * shingle set in one map-side pass (the exploded view is already
    * distinct), then one shuffle groups each shingle's posting list
    * through the BOUNDED CappedCollectLong aggregate — a
    * stop-shingle's list never accumulates past the df cap in any
    * buffer (map-side partial or final); hot shingles collapse to a
    * NULL marker instead of an unbounded single-key list. Rare
    * buckets (2 ≤ df ≤ bound) explode into their within-bucket pairs
    * map-side — no df-join-back, no shingle self-join. The shingle
    * sets are shared by the candidate join and both verify sides via
    * a lazy localCheckpoint (blocks reclaimed by the ContextCleaner).
    * Returns (per-doc shingle sets, candidate pairs da < db). */
  private val ngramCache = new graft.SessionCache[(DataFrame, DataFrame)]

  private def ngramCandidates(s: SparkSession, d: String): (DataFrame, DataFrame) =
    // ONE candidate build per (session, scale dir): D4 and D8 consume
    // the identical (sets, cand) machinery and differ only in the
    // verify ratio, so the build computes once (the d_cluster /
    // t_bpe SessionCache discipline; cold cost stays visible through
    // Bench's rep1_gap report). `cand` is checkpointed too — without
    // blocks the second consumer would silently re-run the whole
    // posting-list chain through the cached frame's lineage.
    ngramCache.getOrCompute(s, d) {
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val sets = Tables.fanOut(s, Tables.documents(s, d))
        .select($"doc_id",
          Signatures.shingleSet(TextOps.words($"text")).as("set"))
        .filter(size($"set") > 0)
        .localCheckpoint(false)
      val cand = sets.select($"doc_id", explode($"set").as("shingle"))
        .groupBy($"shingle")
        .agg(graft.functions.GraftFunctions
          .collectCapped($"doc_id", NGRAM_MAX_DF).as("ds"))
        .filter($"ds".isNotNull && size($"ds") >= 2)
        .select(explode(bucketPairs($"ds")).as("p"))
        .groupBy($"p._1".as("da"), $"p._2".as("db"))
        .agg(count(lit(1)).as("n_common"))
        .filter($"n_common" >= NGRAM_MIN_COMMON)
        .select($"da", $"db")
        .localCheckpoint(false)
      (sets, cand)
    }

  /** D2's candidate generation over a precomputed `(doc_id, sig)`
    * relation: LSH band keys, band equi-join → distinct ordered
    * near-dup pairs (doc_a < doc_b). Split out so D9 can reuse the
    * band join on a relation that also carries the shingle sets. */
  private def minhashPairsOf(sig: DataFrame): DataFrame = {
    val bands = sig
      .select(col("doc_id"), explode(sequence(lit(1), lit(MINHASH_BANDS))).as("band"), col("sig"))
      .withColumn("bv",
        expr(s"array_join(slice(sig, (band-1)*$MINHASH_ROWS + 1, $MINHASH_ROWS), '')"))
      .select(col("doc_id"), col("band"), col("bv"))
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** D2's candidate generation, shared with D6: per-doc k-min
    * signature (map-side) feeding [[minhashPairsOf]]. ONE build per
    * (session, scale dir) — the d_minhash_lsh key and the cluster
    * closure consume the identical pair set (round 15, the
    * ngramCandidates discipline; cold cost visible via rep1_gap). */
  private val minhashCache = new graft.SessionCache[DataFrame]

  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashCache.getOrCompute(s, d) {
      import s.implicits._
      minhashPairsOf(Tables.fanOut(s, Tables.documents(s, d))
        .select($"doc_id",
          Signatures.minhashSig(MINHASH_K)(TextOps.words($"text")).as("sig"))
        .filter($"sig".isNotNull))
        .localCheckpoint(false)
    }

  /** One dup-cluster closure per (session, scale dir): d_cluster,
    * d_canonical, and d_cluster_spec all consume the SAME
    * connected-components result — the most expensive dedup
    * computation — so it computes once ([[graft.SessionCache]]'s
    * discipline; the closure's own final checkpoint makes the cached
    * plan a reusable LogicalRDD scan after the first execution). */
  private val ccCache = new graft.SessionCache[DataFrame]

  private def clusterClosure(s: SparkSession, d: String): DataFrame =
    ccCache.getOrCompute(s, d) {
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id".cast("long").as("id"))
      val pairs = minhashPairs(s, d)
        .select($"doc_a".as("src"), $"doc_b".as("dst"))
      graft.graph.ConnectedComponents.run(s, docs, pairs)
        .select($"id".as("doc_id"), $"component".as("cluster_id"),
          ($"id" === $"component").as("is_survivor"))
        .localCheckpoint(eager = false)
    }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // D1: exact dedup — normalized-text hash groups, first-id-wins
    // canonical representative (the INSERT-OR-IGNORE analog).
    "d_exact" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .select($"doc_id", TextOps.md5s(TextOps.norm($"text")).as("norm_hash"))
        .groupBy($"norm_hash")
        .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("canonical_id"))
    },

    // D2: MinHash signatures + LSH banding → near-dup candidate pairs.
    // The k-min signature is one map-side pass per document
    // (Signatures.minhashSig); only the band equi-join shuffles.
    "d_minhash_lsh" -> { (s, d) => minhashPairs(s, d) },

    // D9: MinHash estimator accuracy ON the hard signal — for every
    // LSH candidate pair, the signature-agreement estimate
    // (agree/k, an exact sixteenth), the exact shingle-set Jaccard,
    // and the calibrated |est − exact| ≤ MINHASH_EST_BOUND guarantee
    // boolean. The oracle recomputes the SAME md5 k-min signatures,
    // so the estimator itself — not just the candidates it gates —
    // is cross-engine verified. One map-side pass computes sig AND
    // set together (shared via lazy localCheckpoint); the verify join
    // touches only candidate pairs, never the corpus product.
    "d_minhash_est" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.fanOut(s, Tables.documents(s, d))
        .select($"doc_id",
          Signatures.minhashSig(MINHASH_K)(TextOps.words($"text")).as("sig"),
          Signatures.shingleSet(TextOps.words($"text")).as("set"))
        .filter($"sig".isNotNull)
        .localCheckpoint(false)
      val agree = (1 to MINHASH_K)
        .map(h => when(element_at($"siga", h) === element_at($"sigb", h), 1L).otherwise(0L))
        .reduce(_ + _)
      minhashPairsOf(docs.select($"doc_id", $"sig"))
        .join(docs.select($"doc_id".as("doc_a"), $"sig".as("siga"), $"set".as("seta")), "doc_a")
        .join(docs.select($"doc_id".as("doc_b"), $"sig".as("sigb"), $"set".as("setb")), "doc_b")
        .withColumn("est_jaccard", agree.cast("double") / lit(MINHASH_K.toDouble))
        .withColumn("i", size(array_intersect($"seta", $"setb")).cast("long"))
        .withColumn("jaccard",
          $"i".cast("double") / (size($"seta") + size($"setb") - $"i").cast("double"))
        .withColumn("est_ok", abs($"est_jaccard" - $"jaccard") <= lit(MINHASH_EST_BOUND))
        .select($"doc_a", $"doc_b", $"est_jaccard", $"jaccard", $"est_ok")
    },

    // D6: dup-cluster consolidation — the step AFTER candidate
    // generation in a real dedup pipeline. Near-dup similarity is not
    // transitive, but the keep/drop decision must be: the candidate
    // pairs are closed into clusters (connected components over the
    // doc-pair graph — same O(log n) star contraction as g_cc, no
    // diameter dependence even for long dup chains) and one survivor
    // (min doc_id) is kept per cluster. Output: every document with
    // its cluster id and survivor verdict.
    "d_cluster" -> { (s, d) => clusterClosure(s, d) },

    // D12: dedup impact spectrum (count-of-counts over D6's cluster
    // sizes — the "what did dedup actually buy" report every pipeline
    // publishes: how many singletons, how many k-way duplicate
    // groups, what document mass each class holds). Re-aggregates the
    // CLUSTER-bounded size table, so the spectrum costs two bounded
    // groupBys on top of the closure; shares are single IEEE
    // divisions of exact integers.
    "d_cluster_spec" -> { (s, d) =>
      import s.implicits._
      val sizes = clusterClosure(s, d)
        .groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
      val spec = sizes.groupBy($"sz".as("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"))
      val tot = spec.agg(sum($"cluster_size" * $"n_clusters").as("n_docs_total"))
      spec.crossJoin(broadcast(tot))
        .select($"cluster_size", $"n_clusters",
          ($"cluster_size" * $"n_clusters").as("n_docs"),
          (($"cluster_size" * $"n_clusters").cast("double") /
            $"n_docs_total".cast("double")).as("doc_share"))
    },

    // D10: canonical-representative selection — the keep-BEST step
    // real pipelines run after D6's closure (min-id survivorship is a
    // tiebreak policy; retention policy keeps the highest-quality
    // member, here the longest text). Per cluster: the argmax doc by
    // (n_chars DESC, doc_id ASC) via ONE partial-aggregable
    // max(struct(n_chars, −doc_id)) — no per-cluster sort, no window
    // over the corpus — plus member count and kept-char mass. The
    // doc-count-sized join with metadata is the only extra shuffle
    // over D6.
    // D11: blocked entity resolution (record linkage on STRUCTURED
    // records — the master-data twin of the document dedup family):
    // candidate pairs come from an equi-join on a composite blocking
    // key (nation × 6-digit name prefix — block count scales with the
    // data, so block SIZE, and with it the per-block pairwise work,
    // stays bounded as the table grows; an unblocked pairwise pass
    // would be O(n²) and is exactly what this primitive exists to
    // avoid), then the matcher runs Levenshtein ≤ 1 on survivors
    // only. Edit distance is integer dynamic programming — identical
    // in any engine — so the match set has a cross-engine bit
    // contract. Blocking recall tradeoff (documented, standard): a
    // near-match differing inside the blocking prefix is missed.
    // Round-14 cap rail: a primary block larger than ER_BLOCK_CAP
    // re-blocks through a SECONDARY rung (two more name digits), so
    // per-block pairwise work stays bounded even if the primary key
    // domain saturates at much larger corpora — the block-size audit
    // is one partial-aggregable count + one equi-join back, and the
    // cap never fires at the shipped SFs (max observed block 57), so
    // the recall contract there is unchanged.
    "d_er" -> { (s, d) =>
      import s.implicits._
      val b0 = Tables.customer(s, d)
        .select($"c_custkey".cast("long").as("custkey"), $"c_name", $"c_nationkey",
          concat($"c_nationkey".cast("string"), lit("|"),
            substring(regexp_replace($"c_name", "[^0-9]", ""), 1, 6)).as("blk1"),
          substring(regexp_replace($"c_name", "[^0-9]", ""), 7, 2).as("sfx"))
      val sizes = b0.groupBy($"blk1").agg(count(lit(1)).as("bn"))
      val b = b0.join(sizes, "blk1")
        .withColumn("blk",
          when($"bn" > ER_BLOCK_CAP, concat($"blk1", lit(":"), $"sfx"))
            .otherwise($"blk1"))
      val x = b.select($"blk", $"custkey".as("custkey_a"), $"c_name".as("name_a"),
        $"c_nationkey".cast("long").as("nationkey"))
      val y = b.select($"blk", $"custkey".as("custkey_b"), $"c_name".as("name_b"))
      // edit distance evaluated ONCE per candidate (it's the dominant
      // per-pair cost — O(len²) DP); project first, filter the column
      x.join(y, "blk")
        .filter($"custkey_a" < $"custkey_b")
        .select($"custkey_a", $"custkey_b", $"nationkey",
          levenshtein($"name_a", $"name_b").cast("long").as("lev"))
        .filter($"lev" <= 1)
    },

    "d_canonical" -> { (s, d) =>
      import s.implicits._
      val clusters = clusterClosure(s, d)
        .select($"doc_id", $"cluster_id")
      val meta = Tables.documents(s, d)
        .select($"doc_id".cast("long").as("doc_id"), $"n_chars".cast("long").as("n_chars"))
      clusters.join(meta, "doc_id")
        .groupBy($"cluster_id")
        .agg(max(struct($"n_chars", (-$"doc_id").as("negid"))).as("m"),
          count(lit(1)).as("n_members"), sum($"n_chars").as("total_chars"))
        .select($"cluster_id", (-$"m.negid").as("canonical_doc"),
          $"m.n_chars".as("canonical_chars"), $"n_members", $"total_chars")
    },

    // D3: SimHash 64-bit + hamming radius via 16-bit chunk blocking.
    // Term-frequency weighted (Charikar simhash): tf weights separate
    // docs drawn from a small shared vocabulary, which both matches
    // the standard algorithm and keeps chunk buckets small.
    "d_simhash" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      // Whole 64-bit tf-weighted signature in one map-side pass per
      // document (Signatures.simhashSig) — the relational
      // formulation shuffled (tokens × 64) bit rows twice.
      val sig = Tables.fanOut(s, Tables.documents(s, d))
        .select($"doc_id", Signatures.simhashSig(SIMHASH_BITS)(TextOps.words($"text")).as("sg"))
      val chunks = sig.select($"doc_id", $"sg",
          explode(sequence(lit(1), lit(SIMHASH_CHUNKS))).as("c"))
        .withColumn("cv", expr(s"substring(sg, (c-1)*$SIMHASH_CHUNK_W + 1, $SIMHASH_CHUNK_W)"))
      val cand = chunks.as("x").join(chunks.as("y"),
          col("x.c") === col("y.c") && col("x.cv") === col("y.cv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("x.sg").as("sa"),
          col("y.doc_id").as("doc_b"), col("y.sg").as("sb"))
        .distinct()
      cand
        .withColumn("hamming", TextOps.hamming($"sa", $"sb"))
        .filter($"hamming" <= SIMHASH_MAX_HAMMING)
        .select($"doc_a", $"doc_b", $"hamming")
    },

    // D4: n-gram Jaccard verification join, blocked on rare shingles.
    // The verify stage joins each candidate pair to the two docs'
    // collected sorted shingle sets and merge-counts the
    // intersection — pair-count × set-size work, instead of a
    // pair × shingle × shingle three-way join.
    "d_ngram_jaccard" -> { (s, d) =>
      import s.implicits._
      val (sets, cand) = ngramCandidates(s, d)
      cand
        .join(sets.select($"doc_id".as("da"), $"set".as("seta")), "da")
        .join(sets.select($"doc_id".as("db"), $"set".as("setb")), "db")
        // sets are distinct, so the codegen'd array_intersect size IS
        // the intersection cardinality (no UDF row boundary here)
        .withColumn("i", size(array_intersect($"seta", $"setb")).cast("long"))
        .withColumn("jaccard",
          $"i".cast("double") / (size($"seta") + size($"setb") - $"i").cast("double"))
        .filter($"jaccard" >= NGRAM_MIN_JACCARD)
        .select($"da".as("doc_a"), $"db".as("doc_b"), $"jaccard")
    },

    // D13: sorted-neighborhood dedup — the THIRD candidate-generation
    // family next to LSH banding (D2) and rare-shingle blocking (D4):
    // order the corpus by a similarity-preserving sort key (first
    // SNM_KEY_LEN chars of the normalized text) and verify only pairs
    // within SNM_WINDOW positions of each other, O(n·w) candidates at
    // any corpus size. The global order is realized DISTRIBUTED
    // (range partitions + per-partition sliding buffers + a bounded
    // edge-row pass for boundary-straddling pairs — see
    // [[SortedNeighborhood]]); the oracle computes the same pair set
    // with one global row_number, an independent formulation.
    // Verification is D4's shingle-Jaccard contract on the candidate
    // pairs.
    "d_sorted_nbr" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.fanOut(s, Tables.documents(s, d))
      val keyed = docs.select(
        substring(TextOps.norm($"text"), 1, SNM_KEY_LEN).as("sk"),
        $"doc_id".as("id"))
      val pairs = SortedNeighborhood.windowPairs(s, keyed, SNM_WINDOW)
        .select(least($"a", $"b").as("da"), greatest($"a", $"b").as("db"))
        .distinct()
      val sets = docs
        .select($"doc_id", Signatures.shingleSet(TextOps.words($"text")).as("set"))
        .filter(size($"set") > 0)
        .localCheckpoint(false)
      pairs
        .join(sets.select($"doc_id".as("da"), $"set".as("seta")), "da")
        .join(sets.select($"doc_id".as("db"), $"set".as("setb")), "db")
        .withColumn("i", size(array_intersect($"seta", $"setb")).cast("long"))
        .withColumn("jaccard",
          $"i".cast("double") / (size($"seta") + size($"setb") - $"i").cast("double"))
        .filter($"jaccard" >= NGRAM_MIN_JACCARD)
        .select($"da".as("doc_a"), $"db".as("doc_b"), $"jaccard")
    },

    // D8: CONTAINMENT dedup — the asymmetric companion of D4: score
    // |A∩B| / min(|A|,|B|), which stays near 1 when a small document
    // is (mostly) included in a large one (boilerplate wrapping,
    // quote inclusion) even though symmetric Jaccard collapses toward
    // |A|/|B| and misses the pair. Same rare-shingle candidate
    // generation and bounded posting lists as D4; only the verify
    // ratio differs.
    "d_containment" -> { (s, d) =>
      import s.implicits._
      val (sets, cand) = ngramCandidates(s, d)
      cand
        .join(sets.select($"doc_id".as("da"), $"set".as("seta")), "da")
        .join(sets.select($"doc_id".as("db"), $"set".as("setb")), "db")
        .withColumn("i", size(array_intersect($"seta", $"setb")).cast("long"))
        .withColumn("containment",
          $"i".cast("double") / least(size($"seta"), size($"setb")).cast("double"))
        .filter($"containment" >= CONTAIN_MIN)
        .select($"da".as("doc_a"), $"db".as("doc_b"), $"containment")
    },

    // D7: semantic dedup (SemDeDup-shaped) — cluster-partitioned
    // screening at LINEAR cost, where D5 verifies pairs. Every vector
    // is assigned to its nearest seed centroid (K fixed low-id
    // vectors — deterministic, no RNG/k-means state), and within each
    // (cluster, flagged) group only the lowest vec_id survives among
    // vectors whose cosine-to-centroid clears the threshold.
    // Scale shape: the K centroids broadcast (dim-sized, like a
    // dimension table); assignment is one map-side pass producing K
    // rows per vector, reduced by a partial-aggregable max(struct) —
    // no vector-vector join anywhere, so cost is O(nK), not O(n²).
    "d_semantic" -> { (s, d) => semanticScreen(s, d) },

    // D14: exact SUBSTRING-level dedup (the Lee et al. 2022
    // deduplicate-text-datasets case) — verbatim token runs of length
    // ≥ SUBSTR_K shared ACROSS documents, inside otherwise-distinct
    // texts, which doc-level (D1), near-dup (D2–D5) and line-level
    // (F16) dedup all miss. Fixed-width anchor shingles stand in for
    // a suffix array: a shared run of length L ≥ K contains exactly
    // L−K+1 overlapping K-anchors, so the union of flagged anchor
    // intervals [pos, pos+K−1] reconstructs every maximal duplicated
    // span — found with groupBys and a per-doc window, never a
    // corpus-wide suffix sort inside one task.
    // Scale shape: the anchor stream is O(total tokens); cross-doc
    // detection is one map-side-distinct + one partial-aggregable
    // count per anchor DIGEST (32 fixed bytes — no posting list is
    // ever materialized, the D4 discipline); the flag returns by a
    // semi-join on the digest; island-merging the intervals is a
    // window whose partitions are DOC-bounded. Per doc: merged span count,
    // duplicated token mass, longest span, duplicated-mass ratio
    // (one IEEE division of exact longs).
    "d_substring" -> { (s, d) =>
      import s.implicits._
      val K = SUBSTR_K
      val toks = Tables.fanOut(s, Tables.documents(s, d))
        .select($"doc_id", TextOps.words($"text").as("w"))
        .filter(size($"w") >= K)
        .localCheckpoint(false)
      // the anchor IDENTITY shuffled through the distinct/count/
      // semi-join chain is a FIXED 32-byte md5-hex digest, not the
      // ~50+-byte variable K-token string (round 15 — the F26
      // sequence-hash discipline): the oracle hashes with the SAME
      // md5 over the same text, so collision behavior is
      // bit-identical cross-engine and the only semantic delta vs raw
      // strings is a 2^-128-class md5 collision aliasing two distinct
      // anchors corpus-wide (accepted, same class as every md5-keyed
      // key in the repo). Hex STRING, not unhex'd 16-byte binary, by
      // same-box A/B at sf1x: binary grouping read 4.40 s where hex
      // reads 3.30 s against the raw string's 3.39 s — BinaryType
      // keys miss the string fast paths and cost more than the 16
      // saved bytes buy back.
      val anch = toks.select($"doc_id",
          explode(sequence(lit(1), size($"w") - (K - 1))).as("pos"),
          $"w")
        .select($"doc_id", $"pos".cast("long").as("pos"),
          md5(array_join(slice($"w", $"pos", lit(K)), " ")).as("sh"))
      val dupSh = anch.select($"sh", $"doc_id").distinct()
        .groupBy($"sh").agg(count(lit(1)).as("nd"))
        .filter($"nd" >= 2).select($"sh")
      val flagged = anch.join(dupSh, Seq("sh"), "left_semi")
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wRun = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val spans = flagged
        .withColumn("brk",
          when($"pos" > coalesce(max($"pos" + lit(K - 1L)).over(wPrev), lit(-1L)), 1L)
            .otherwise(0L))
        .withColumn("island", sum($"brk").over(wRun))
        .groupBy($"doc_id", $"island")
        .agg(min($"pos").as("s"), (max($"pos") + lit(K - 1L)).as("e"))
      spans.groupBy($"doc_id")
        .agg(count(lit(1)).as("n_dup_spans"),
          sum($"e" - $"s" + 1L).as("dup_tokens"),
          max($"e" - $"s" + 1L).as("max_span"))
        .join(toks.select($"doc_id", size($"w").cast("long").as("n_tokens")), "doc_id")
        .select($"doc_id", $"n_tokens", $"n_dup_spans", $"dup_tokens", $"max_span",
          ($"dup_tokens".cast("double") / $"n_tokens".cast("double")).as("dup_ratio"))
    },

    // D5: embedding-cosine near-dup pairs via deterministic
    // random-hyperplane LSH banding.
    "d_embed_dup" -> { (s, d) =>
      import s.implicits._
      import graft.similarity.VectorOps
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val bands = VectorOps.bandKeys(
        VectorOps.signatures(Tables.embeddings(s, d), "vec_id", EMBED_PLANES),
        "vec_id", EMBED_PLANES, EMBED_BANDS)
      val cand = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
            col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("a"), col("y.vec_id").as("b"))
        .distinct()
      cand
        .join(e.select($"vec_id".as("a"), $"embedding".as("ea"), $"nrm".as("na")), "a")
        .join(e.select($"vec_id".as("b"), $"embedding".as("eb"), $"nrm".as("nb")), "b")
        .withColumn("cosine", VectorOps.dotDecFast($"ea", $"eb") / ($"na" * $"nb"))
        .filter($"cosine" >= EMBED_MIN_COSINE)
        .select($"a".as("vec_a"), $"b".as("vec_b"), $"cosine")
    },
  )

  /** D7's implementation, shared with the composed embedding pipeline
    * (`s_pipeline` in the similarity pack): per-vector nearest-seed-
    * centroid assignment + per-cluster survivor window. Returns
    * (vec_id, cluster_id, centroid_sim, is_kept). */
  def semanticScreen(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.similarity.VectorOps
    graft.functions.GraftFunctions.register(s)
    val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
    val cents = e.filter($"vec_id" < SEM_K)
      .select($"vec_id".as("cid"), $"embedding".as("ce"), $"nrm".as("cn"))
    val sims = e.select($"vec_id", $"embedding", $"nrm")
      .crossJoin(broadcast(cents))
      .withColumn("sim", VectorOps.dotDecFast($"embedding", $"ce") / ($"nrm" * $"cn"))
    // argmax centroid: max sim, tie → min cid (struct ordering on
    // (sim, -cid) — both engines compute bit-identical sims).
    val assigned = sims.groupBy($"vec_id")
      .agg(max(struct($"sim", (-$"cid").as("ncid"))).as("m"))
      .select($"vec_id", (-$"m.ncid").as("cluster_id"), $"m.sim".as("centroid_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id", $"dup").orderBy($"vec_id".asc)
    assigned
      .withColumn("dup", $"centroid_sim" >= SEM_TAU)
      .withColumn("rn", row_number().over(w))
      .select($"vec_id", $"cluster_id", $"centroid_sim",
        (!$"dup" || $"rn" === 1).as("is_kept"))
  }

  /** D7's oracle CTE chain ending in
    * `flagged(vec_id, cluster_id, centroid_sim, dup, rn)` — shared
    * with the `s_pipeline` oracle. */
  val semanticSqlCtes: String =
    s"""sdims AS (
       | SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
       | FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
       |snrm AS (SELECT vec_id, sqrt(CAST(SUM(CAST(x*x AS DECIMAL(28,12))) AS DOUBLE)) AS n FROM sdims GROUP BY vec_id),
       |ssims AS (
       | SELECT v.vec_id, c.vec_id AS cid,
       |  CAST(SUM(CAST(floor(v.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 / (nv.n * nc.n) AS sim
       | FROM sdims v JOIN sdims c ON c.i = v.i AND c.vec_id < $SEM_K
       |  JOIN snrm nv ON nv.vec_id = v.vec_id JOIN snrm nc ON nc.vec_id = c.vec_id
       | GROUP BY v.vec_id, c.vec_id, nv.n, nc.n),
       |sasg AS (
       | SELECT vec_id, cid AS cluster_id, sim AS centroid_sim FROM ssims
       | QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) = 1),
       |flagged AS (
       | SELECT *, centroid_sim >= $SEM_TAU AS dup,
       |  ROW_NUMBER() OVER (PARTITION BY cluster_id, centroid_sim >= $SEM_TAU ORDER BY vec_id ASC) AS rn
       | FROM sasg)""".stripMargin

  /** Shared oracle CTE: distinct 3-word shingles per doc (1-based,
    * mirroring [[TextOps.shingles3]]). */
  private val shSql =
    """toks AS (SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\s+',' ','g'), ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
      |       FROM toks, UNNEST(range(1, len(w)-1)) AS t(i) WHERE len(w) >= 3)""".stripMargin

  /** CTE list deriving `cand(doc_a, doc_b)` — the MinHash-LSH
    * candidate pairs — shared by the D2 and D6 oracles. */
  private val minhashCandSql: String = {
    val mins = (1 to MINHASH_K)
      .map(h => s"MIN(md5('${h}_' || shingle)) AS m$h").mkString(", ")
    val bandSelects = (1 to MINHASH_BANDS).map { b =>
      val bv = (1 to MINHASH_ROWS).map(r => s"m${(b - 1) * MINHASH_ROWS + r}").mkString(" || ")
      s"SELECT doc_id, $b AS band, $bv AS bv FROM sig"
    }.mkString(" UNION ALL ")
    s"""$shSql,
       |sig AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |         FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)""".stripMargin
  }

  override def oracles: Map[String, String] = Map(
    "d_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)),'\s+',' ','g')) AS norm_hash,
        | CAST(COUNT(*) AS BIGINT) AS n_docs, MIN(doc_id) AS canonical_id
        |FROM documents GROUP BY 1""".stripMargin,
    "d_minhash_lsh" ->
      s"""WITH $minhashCandSql
         |SELECT doc_a, doc_b FROM cand""".stripMargin,
    "d_minhash_est" -> {
      val agree = (1 to MINHASH_K)
        .map(h => s"CASE WHEN a.m$h = b.m$h THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH $minhashCandSql,
         |est AS (SELECT c.doc_a, c.doc_b,
         |         CAST(($agree) AS DOUBLE) / $MINHASH_K.0 AS est_jaccard
         |        FROM cand c JOIN sig a ON a.doc_id = c.doc_a
         |         JOIN sig b ON b.doc_id = c.doc_b),
         |inter AS (SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
         |          FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a
         |           JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
         |          GROUP BY 1, 2),
         |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         |scored AS (
         | SELECT e.doc_a, e.doc_b, e.est_jaccard,
         |  CAST(COALESCE(i.i, 0) AS DOUBLE)
         |   / CAST(za.n + zb.n - COALESCE(i.i, 0) AS DOUBLE) AS jaccard
         | FROM est e
         |  LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
         |  JOIN sz za ON za.doc_id = e.doc_a JOIN sz zb ON zb.doc_id = e.doc_b)
         |SELECT doc_a, doc_b, est_jaccard, jaccard,
         | abs(est_jaccard - jaccard) <= $MINHASH_EST_BOUND AS est_ok
         |FROM scored""".stripMargin
    },
    "d_cluster" ->
      s"""WITH RECURSIVE $minhashCandSql,
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |      UNION SELECT doc_b, doc_a FROM cand),
         |reach(node, lbl) AS (
         | SELECT doc_id, doc_id FROM documents
         | UNION
         | SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node)
         |SELECT node AS doc_id, MIN(lbl) AS cluster_id,
         | node = MIN(lbl) AS is_survivor
         |FROM reach GROUP BY node""".stripMargin,
    "d_cluster_spec" ->
      s"""WITH RECURSIVE $minhashCandSql,
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |      UNION SELECT doc_b, doc_a FROM cand),
         |reach(node, lbl) AS (
         | SELECT doc_id, doc_id FROM documents
         | UNION
         | SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
         |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
         |sizes AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz FROM cl GROUP BY cluster_id),
         |spec AS (
         | SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
         | FROM sizes GROUP BY sz),
         |tot AS (SELECT CAST(SUM(cluster_size * n_clusters) AS BIGINT) AS n_docs_total FROM spec)
         |SELECT s.cluster_size, s.n_clusters,
         | CAST(s.cluster_size * s.n_clusters AS BIGINT) AS n_docs,
         | CAST(s.cluster_size * s.n_clusters AS DOUBLE) / CAST(t.n_docs_total AS DOUBLE) AS doc_share
         |FROM spec s CROSS JOIN tot t""".stripMargin,
    // D6's closure + per-cluster argmax by (n_chars DESC, doc_id ASC)
    "d_er" ->
      s"""WITH b0 AS (
         | SELECT CAST(c_custkey AS BIGINT) AS custkey, c_name,
         |  CAST(c_nationkey AS BIGINT) AS nationkey,
         |  c_nationkey || '|' || substr(regexp_replace(c_name, '[^0-9]', '', 'g'), 1, 6) AS blk1,
         |  substr(regexp_replace(c_name, '[^0-9]', '', 'g'), 7, 2) AS sfx
         | FROM customer),
         |sz AS (SELECT blk1, COUNT(*) AS bn FROM b0 GROUP BY 1),
         |b AS (SELECT b0.custkey, b0.c_name, b0.nationkey,
         |       CASE WHEN sz.bn > $ER_BLOCK_CAP THEN b0.blk1 || ':' || b0.sfx
         |            ELSE b0.blk1 END AS blk
         |      FROM b0 JOIN sz USING (blk1))
         |SELECT x.custkey AS custkey_a, y.custkey AS custkey_b,
         | x.nationkey, CAST(levenshtein(x.c_name, y.c_name) AS BIGINT) AS lev
         |FROM b x JOIN b y ON x.blk = y.blk AND x.custkey < y.custkey
         |WHERE levenshtein(x.c_name, y.c_name) <= 1""".stripMargin,
    "d_canonical" ->
      s"""WITH RECURSIVE $minhashCandSql,
         |e AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |      UNION SELECT doc_b, doc_a FROM cand),
         |reach(node, lbl) AS (
         | SELECT doc_id, doc_id FROM documents
         | UNION
         | SELECT e.dst, r.lbl FROM reach r JOIN e ON e.src = r.node),
         |cl AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
         |j AS (SELECT c.cluster_id, c.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
         |      FROM cl c JOIN documents d ON d.doc_id = c.doc_id),
         |pick AS (SELECT cluster_id, doc_id, n_chars,
         |          ROW_NUMBER() OVER (PARTITION BY cluster_id
         |            ORDER BY n_chars DESC, doc_id ASC) AS rn
         |         FROM j),
         |agg AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
         |         CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |        FROM j GROUP BY 1)
         |SELECT a.cluster_id, p.doc_id AS canonical_doc,
         | p.n_chars AS canonical_chars, a.n_members, a.total_chars
         |FROM agg a JOIN pick p ON p.cluster_id = a.cluster_id AND p.rn = 1""".stripMargin,
    "d_simhash" ->
      s"""WITH toks AS (
         | SELECT doc_id, tok, COUNT(*) AS tf
         | FROM (SELECT doc_id, UNNEST(string_split(regexp_replace(lower(trim(text)),'\\s+',' ','g'), ' ')) AS tok FROM documents)
         | GROUP BY doc_id, tok),
         |tokbits AS (
         | SELECT tok, b,
         |  CASE WHEN ((position(substr(md5(tok), (b+3)//4, 1) IN '0123456789abcdef') - 1) >> (3 - ((b-1) % 4))) & 1 = 1
         |   THEN 1 ELSE -1 END AS sgn
         | FROM (SELECT DISTINCT tok FROM toks), UNNEST(range(1, ${SIMHASH_BITS + 1})) tb(b)),
         |bits AS (
         | SELECT t.doc_id, tb.b, CASE WHEN SUM(tb.sgn * t.tf) >= 0 THEN '1' ELSE '0' END AS sb
         | FROM toks t JOIN tokbits tb ON t.tok = tb.tok GROUP BY t.doc_id, tb.b),
         |sig AS (SELECT doc_id, string_agg(sb, '' ORDER BY b) AS sg FROM bits GROUP BY doc_id),
         |chunks AS (SELECT doc_id, sg, c, substr(sg, (c-1)*$SIMHASH_CHUNK_W + 1, $SIMHASH_CHUNK_W) AS cv
         |           FROM sig, UNNEST(range(1, ${SIMHASH_CHUNKS + 1})) tc(c)),
         |cand AS (SELECT DISTINCT x.doc_id AS doc_a, x.sg AS sa, y.doc_id AS doc_b, y.sg AS sb
         |         FROM chunks x JOIN chunks y ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id)
         |SELECT doc_a, doc_b,
         | CAST(len(list_filter(range(1, ${SIMHASH_BITS + 1}), i -> substr(sa, i, 1) <> substr(sb, i, 1))) AS BIGINT) AS hamming
         |FROM cand
         |WHERE len(list_filter(range(1, ${SIMHASH_BITS + 1}), i -> substr(sa, i, 1) <> substr(sb, i, 1))) <= $SIMHASH_MAX_HAMMING""".stripMargin,
    "d_ngram_jaccard" ->
      s"""WITH $shSql,
         |df AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1),
         |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN df USING (shingle) WHERE df.c <= $NGRAM_MAX_DF),
         |cand AS (SELECT a.doc_id AS da, b.doc_id AS db
         |         FROM rare a JOIN rare b USING (shingle) WHERE a.doc_id < b.doc_id
         |         GROUP BY 1, 2 HAVING COUNT(*) >= $NGRAM_MIN_COMMON),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.da, c.db, COUNT(*) AS i
         |          FROM cand c JOIN sh s1 ON s1.doc_id = c.da
         |           JOIN sh s2 ON s2.doc_id = c.db AND s2.shingle = s1.shingle
         |          GROUP BY c.da, c.db)
         |SELECT da AS doc_a, db AS doc_b,
         | CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) AS jaccard
         |FROM inter JOIN sz za ON za.doc_id = da JOIN sz zb ON zb.doc_id = db
         |WHERE CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) >= $NGRAM_MIN_JACCARD""".stripMargin,
    // Independent formulation: ONE global row_number realizes the
    // sort order the engine builds from range partitions + seam pass.
    "d_sorted_nbr" ->
      s"""WITH keyed AS (
         | SELECT doc_id, substr(regexp_replace(lower(trim(text)),'\\s+',' ','g'), 1, $SNM_KEY_LEN) AS sk
         | FROM documents),
         |rn AS (SELECT doc_id, row_number() OVER (ORDER BY sk, doc_id) AS rn FROM keyed),
         |cand0 AS (SELECT a.doc_id AS x, b.doc_id AS y
         |          FROM rn a JOIN rn b ON b.rn - a.rn BETWEEN 1 AND ${SNM_WINDOW - 1}),
         |cand AS (SELECT DISTINCT LEAST(x, y) AS da, GREATEST(x, y) AS db FROM cand0),
         |$shSql,
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.da, c.db, COUNT(*) AS i
         |          FROM cand c JOIN sh s1 ON s1.doc_id = c.da
         |           JOIN sh s2 ON s2.doc_id = c.db AND s2.shingle = s1.shingle
         |          GROUP BY c.da, c.db)
         |SELECT da AS doc_a, db AS doc_b,
         | CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) AS jaccard
         |FROM inter JOIN sz za ON za.doc_id = da JOIN sz zb ON zb.doc_id = db
         |WHERE CAST(i AS DOUBLE) / CAST(za.n + zb.n - i AS DOUBLE) >= $NGRAM_MIN_JACCARD""".stripMargin,
    "d_containment" ->
      s"""WITH $shSql,
         |df AS (SELECT shingle, COUNT(*) AS c FROM sh GROUP BY 1),
         |rare AS (SELECT s.doc_id, s.shingle FROM sh s JOIN df USING (shingle) WHERE df.c <= $NGRAM_MAX_DF),
         |cand AS (SELECT a.doc_id AS da, b.doc_id AS db
         |         FROM rare a JOIN rare b USING (shingle) WHERE a.doc_id < b.doc_id
         |         GROUP BY 1, 2 HAVING COUNT(*) >= $NGRAM_MIN_COMMON),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.da, c.db, COUNT(*) AS i
         |          FROM cand c JOIN sh s1 ON s1.doc_id = c.da
         |           JOIN sh s2 ON s2.doc_id = c.db AND s2.shingle = s1.shingle
         |          GROUP BY c.da, c.db)
         |SELECT da AS doc_a, db AS doc_b,
         | CAST(i AS DOUBLE) / CAST(LEAST(za.n, zb.n) AS DOUBLE) AS containment
         |FROM inter JOIN sz za ON za.doc_id = da JOIN sz zb ON zb.doc_id = db
         |WHERE CAST(i AS DOUBLE) / CAST(LEAST(za.n, zb.n) AS DOUBLE) >= $CONTAIN_MIN""".stripMargin,
    "d_semantic" ->
      s"""WITH $semanticSqlCtes
         |SELECT vec_id, cluster_id, centroid_sim, (NOT dup) OR rn = 1 AS is_kept
         |FROM flagged""".stripMargin,
    "d_substring" ->
      s"""WITH toks AS (
         | SELECT doc_id, string_split(regexp_replace(lower(trim(text)),'\\s+',' ','g'), ' ') AS w
         | FROM documents),
         |anch AS (
         | SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |  md5(list_aggregate(w[i:i+${SUBSTR_K - 1}], 'string_agg', ' ')) AS sh
         | FROM toks, UNNEST(range(1, len(w)-${SUBSTR_K - 2})) t(i) WHERE len(w) >= $SUBSTR_K),
         |dup AS (SELECT sh FROM (SELECT DISTINCT sh, doc_id FROM anch)
         |        GROUP BY sh HAVING COUNT(*) >= 2),
         |da AS (SELECT a.doc_id, a.pos FROM anch a JOIN dup USING (sh)),
         |isl AS (SELECT doc_id, pos,
         |         CASE WHEN pos > COALESCE(MAX(pos + ${SUBSTR_K - 1}) OVER (
         |           PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
         |          THEN 1 ELSE 0 END AS brk
         |        FROM da),
         |isl2 AS (SELECT doc_id, pos, SUM(brk) OVER (
         |          PARTITION BY doc_id ORDER BY pos
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |         FROM isl),
         |spans AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + ${SUBSTR_K - 1} AS e
         |          FROM isl2 GROUP BY doc_id, island),
         |n AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens FROM toks)
         |SELECT s.doc_id, n.n_tokens, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
         | CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
         | CAST(MAX(e - s + 1) AS BIGINT) AS max_span,
         | CAST(SUM(e - s + 1) AS DOUBLE) / CAST(n.n_tokens AS DOUBLE) AS dup_ratio
         |FROM spans s JOIN n USING (doc_id) GROUP BY s.doc_id, n.n_tokens""".stripMargin,
    "d_embed_dup" ->
      s"""WITH dims AS (
         | SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
         | FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
         |proj AS (
         | SELECT vec_id, j,
         |  CASE WHEN SUM(CAST(floor((CASE WHEN substr(md5(j || '_' || i), 1, 1) < '8' THEN x ELSE -x END) * 1e12 + 0.5) AS BIGINT)) >= 0
         |   THEN '1' ELSE '0' END AS bit
         | FROM dims, UNNEST(range(1, ${EMBED_PLANES + 1})) tj(j) GROUP BY vec_id, j),
         |sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY j) AS sg FROM proj GROUP BY vec_id),
         |bands AS (SELECT vec_id, b, substr(sg, (b-1)*4 + 1, 4) AS bv
         |          FROM sig, UNNEST(range(1, ${EMBED_BANDS + 1})) tb(b)),
         |cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         |         FROM bands x JOIN bands y ON x.b = y.b AND x.bv = y.bv AND x.vec_id < y.vec_id),
         |nrm AS (SELECT vec_id, sqrt(CAST(SUM(CAST(x*x AS DECIMAL(28,12))) AS DOUBLE)) AS n FROM dims GROUP BY vec_id),
         |dot AS (SELECT c.a, c.b, CAST(SUM(CAST(floor(da.x * db.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM cand c JOIN dims da ON da.vec_id = c.a
         |         JOIN dims db ON db.vec_id = c.b AND db.i = da.i
         |        GROUP BY c.a, c.b)
         |SELECT d.a AS vec_a, d.b AS vec_b, d.dp / (na.n * nb.n) AS cosine
         |FROM dot d JOIN nrm na ON na.vec_id = d.a JOIN nrm nb ON nb.vec_id = d.b
         |WHERE d.dp / (na.n * nb.n) >= $EMBED_MIN_COSINE""".stripMargin,
  )
}
