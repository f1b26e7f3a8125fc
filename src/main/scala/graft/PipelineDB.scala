package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** User-facing front door for the PIPELINE packs (SURVEY §2 C–H) —
  * the [[graft.graph.GraphDB]] of the relational / dedup / similarity
  * / text / multimodal / events surfaces (round-11, verdict #7: the
  * packs were previously reachable only as query-key closures).
  *
  * The model mirrors the reference's `PersistentDataBase`
  * (main.py:117 — load data INTO the store, then query it) and the
  * engine's own [[graft.sources.GraphStore]]: a PipelineDB is rooted
  * at a directory; [[importTable]] persists caller DataFrames there
  * in the engine's parquet layout (one `<name>.parquet` per table —
  * exactly [[Tables]]' convention, so every query reads with column
  * pruning + predicate pushdown); the query surface then runs any of
  * the verified operators against the imported tables.
  *
  * Three tiers, thinnest first:
  *
  *   - [[run]]: every SURVEY §2 query key (186, DuckDB-oracled) by
  *     name — `db.run("d_minhash_lsh")`, `db.run("q_asof")` — over
  *     whatever tables this root holds. The full engine behind ONE
  *     method.
  *   - family verbs ([[dedup]], [[dupClusters]], [[canonical]],
  *     [[knn]], [[textSignals]], [[splitCorpus]], [[stream]],
  *     [[store]]): named strategy → key routing for the LLM-pipeline,
  *     streaming-replay and versioned-store families, so the common
  *     calls read as intent rather than key ids.
  *   - [[sql]] / [[views]]: ANSI SQL over the imported tables
  *     (registered views + the custom functions), the reference's
  *     SQLite-shaped relational surface.
  *
  * Table schemas expected by the packs (see TESTDATA.md; importers
  * validate the required columns):
  *
  *   - `documents(doc_id LONG, text STRING, lang STRING,
  *     source STRING, n_chars LONG)` — dedup (D) + text (F) +
  *     multimodal (G: payload = text bytes).
  *   - `embeddings(vec_id LONG, embedding ARRAY<FLOAT>, label INT)`
  *     — similarity (E).
  *   - `events(event_id LONG, ts TIMESTAMP, user_id LONG,
  *     event_type STRING, value DOUBLE, props STRING)` — events/
  *     streaming (H).
  *   - the TPC-H-ish star tables (`region … lineitem`) — relational
  *     (C) + the graph keys' part table.
  *
  * Media decode rides [[features]] directly (no import needed): the
  * G2 seam accepts any `(id, payload)` dataset.
  */
final class PipelineDB(s: SparkSession, root: String) {

  /** Persist (or replace) one table under this root in the engine's
    * layout. `name` must be one of [[Tables.names]]; `required`
    * columns are validated per table so a schema drift fails at
    * import, not inside some operator's plan. */
  def importTable(name: String, df: DataFrame): Unit = {
    require(Tables.names.contains(name),
      s"unknown table '$name' — importable: ${Tables.names.mkString(", ")}")
    val need = PipelineDB.requiredColumns.getOrElse(name, Seq.empty)
    val missing = need.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"table '$name' is missing required column(s) ${missing.mkString(", ")}")
    df.write.mode("overwrite").parquet(s"$root/$name.parquet")
  }

  def importDocuments(docs: DataFrame): Unit = importTable("documents", docs)
  def importEmbeddings(emb: DataFrame): Unit = importTable("embeddings", emb)
  def importEvents(events: DataFrame): Unit = importTable("events", events)

  /** Every query key this build ships (the SURVEY §2 inventory). */
  def keys: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Run one verified operator against the imported tables. */
  def run(key: String): DataFrame = {
    val q = SparkEntry.queries.getOrElse(key,
      throw new IllegalArgumentException(
        s"unknown query key '$key' — see PipelineDB.keys (${SparkEntry.queries.size} available)"))
    q(s, root)
  }

  // ---- family verbs -------------------------------------------

  /** Duplicate detection over the imported `documents`, by strategy:
    *   - "exact"     → normalized-hash groups (D1)
    *   - "minhash"   → MinHash+LSH near-dup candidate pairs (D2)
    *   - "simhash"   → SimHash hamming-≤3 pairs (D3)
    *   - "ngram"     → rare-shingle-blocked Jaccard-verified pairs (D4)
    *   - "embedding" → embedding-cosine near-dup pairs (D5, needs
    *                   `embeddings`)
    *   - "semantic"  → SemDeDup-style centroid screen (D7, needs
    *                   `embeddings`)
    *   - "sorted"    → sorted-neighborhood window pairs (D13)
    *   - "substring" → cross-doc duplicated token-span masses (D14) */
  def dedup(strategy: String = "minhash"): DataFrame =
    run(PipelineDB.route("dedup strategy", PipelineDB.dedupKeys, strategy))

  /** D6: near-dup candidates closed into clusters with survivors. */
  def dupClusters(): DataFrame = run("d_cluster")

  /** D10: keep-best representative per duplicate cluster. */
  def canonical(): DataFrame = run("d_canonical")

  /** Top-k similarity search over the imported `embeddings`, by
    * method: "brute" (E1 exact), "lsh" (E2), "ivf" (E3), "pq" (E5),
    * "binary" (E12), "filtered" (E13 metadata-predicated),
    * "maxsim" (E9 multi-vector late interaction), "ivfpq" (E20
    * composed cells + codes). */
  def knn(method: String = "brute"): DataFrame =
    run(PipelineDB.route("knn method", PipelineDB.knnKeys, method))

  /** Text-quality signals over the imported `documents`, by signal:
    * "quality" (F2), "langid" (F3), "tokens" (F1), "repetition"
    * (F10), "readability" (F24), "fingerprint" (F4), "scrub" (F22),
    * "bpe" (F26 learned-merge encoding). */
  def textSignals(signal: String = "quality"): DataFrame =
    run(PipelineDB.route("text signal", PipelineDB.textKeys, signal))

  /** F5: deterministic id-hash train/val/test assignment. */
  def splitCorpus(): DataFrame = run("t_split")

  /** Structured Streaming front door: run one verified streaming
    * surface over the imported `events` table, replayed TO COMPLETION
    * through the chunked file-source harness (StreamReplay — the
    * H4/H22/H24/H26 pack), returning the final materialized result.
    * Surfaces: "window" (tumbling counts), "sessions", "ewma",
    * "attrib" (funnel attribution), "uniques" (windowed HLL),
    * "dedup", "heavy_hitters", "totals", "ingest", "chain",
    * "enrich" (stream-static dimension join), "cdc" (tombstone
    * materialization), "outer_join" (stream-stream LEFT OUTER
    * interval join). */
  def stream(surface: String = "window"): DataFrame =
    run(PipelineDB.route("stream surface", PipelineDB.streamKeys, surface))

  /** A36: versioned graph persistence rooted UNDER this db — the
    * reference's `PersistentDataBase` lifecycle (main.py:117 —
    * create / INSERT OR IGNORE / reload) as explicit verbs over
    * `$root/graph.store`: [[Store.write]] (reset to a new snapshot),
    * [[Store.upsert]] (insert-or-ignore a delta), time-travel reads
    * and snapshot [[Store.diff]]s. Snapshots are immutable parquet
    * behind staging + atomic rename, so concurrent readers never see
    * a torn version. */
  def store(): PipelineDB.Store = new PipelineDB.Store(s, s"$root/graph.store")

  /** G2: the batched decode / feature-extraction seam over any
    * `(id, payload)` dataset — real PNG/baseline-JPEG pixel decode,
    * deterministic stub elsewhere. */
  def features(payloads: Dataset[(Long, Array[Byte])]): DataFrame =
    graft.multimodal.MultimodalPack.featureVectorsOf(s, payloads)

  // ---- SQL surface --------------------------------------------

  /** Register every IMPORTED table as a temp view (plus the custom
    * functions) for plain-SQL access — only tables present under
    * this root, so a partial import serves partial SQL instead of
    * failing on the absent paths. */
  def views(): Unit = {
    graft.functions.GraftFunctions.register(s)
    Tables.names
      .filter(n => java.nio.file.Files.exists(java.nio.file.Paths.get(root, s"$n.parquet")))
      .foreach { n =>
        val df = if (n == "events") Tables.events(s, root) else Tables.load(s, root, n)
        df.createOrReplaceTempView(n)
      }
  }

  /** One-shot SQL over the imported tables. */
  def sql(query: String): DataFrame = { views(); s.sql(query) }
}

object PipelineDB {

  /** Versioned edge-store handle (see [[PipelineDB.store]]): thin
    * named-verb surface over [[graft.sources.GraphStore]] so the
    * facade covers the persistence family with the same semantics the
    * `g_store_diff` key verifies against the DuckDB oracle. */
  final class Store private[graft] (s: SparkSession, root: String) {
    import graft.sources.GraphStore

    /** Reset-write: dedup + persist `edges(src, dst, ...)` as the
      * next immutable snapshot; returns its version. */
    def write(edges: DataFrame): Int = GraphStore.write(edges, root)

    /** INSERT-OR-IGNORE: union the delta into the latest snapshot
      * (existing (src, dst) rows win) as a new version. */
    def upsert(delta: DataFrame): Int = GraphStore.upsert(s, root, delta)

    /** Latest committed snapshot. */
    def read(): DataFrame = GraphStore.read(s, root)

    /** Time-travel read of one committed version. */
    def readVersion(v: Int): DataFrame = GraphStore.readVersion(s, root, v)

    /** Edge diff between two snapshots: (src, dst, change) with
      * change ∈ {added, removed} — two anti equi-joins per direction,
      * never a full-table comparison state. */
    def diff(fromV: Int, toV: Int): DataFrame = GraphStore.diff(s, root, fromV, toV)

    /** Highest committed version, 0 if the store is empty. */
    def latestVersion: Int = GraphStore.latestVersion(s, root)
  }

  /** Required columns per importable table (what the packs consume —
    * kept minimal so callers can omit columns only optional keys
    * touch). */
  private val requiredColumns: Map[String, Seq[String]] = Map(
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value"))

  private val dedupKeys = Map(
    "exact" -> "d_exact", "minhash" -> "d_minhash_lsh",
    "simhash" -> "d_simhash", "ngram" -> "d_ngram_jaccard",
    "embedding" -> "d_embed_dup", "semantic" -> "d_semantic",
    "sorted" -> "d_sorted_nbr", "substring" -> "d_substring")

  private val knnKeys = Map(
    "brute" -> "s_knn_brute", "lsh" -> "s_knn_ann", "ivf" -> "s_knn_ivf",
    "pq" -> "s_knn_pq", "binary" -> "s_knn_binary",
    "filtered" -> "s_knn_filtered", "maxsim" -> "s_maxsim",
    "ivfpq" -> "s_knn_ivfpq", "ivfpq_refine" -> "s_knn_ivfpq_r")

  private val streamKeys = Map(
    "window" -> "e_stream_window", "sessions" -> "e_stream_sessions",
    "ewma" -> "e_stream_ewma", "attrib" -> "e_stream_attrib",
    "uniques" -> "e_stream_uniques", "dedup" -> "e_stream_dedup",
    "heavy_hitters" -> "e_stream_hh", "totals" -> "e_stream_totals",
    "ingest" -> "e_stream_ingest", "chain" -> "e_stream_chain",
    "enrich" -> "e_stream_enrich", "cdc" -> "e_stream_cdc",
    "outer_join" -> "e_stream_outer", "incremental" -> "e_stream_incr")

  /** The replay keys [[PipelineDB.stream]] can route — spec-pinned
    * equal to [[SparkEntry.replayBackedKeys]] so a new replay surface
    * cannot land without a facade name (the two lists would otherwise
    * drift silently: this map names intents by hand, the registry is
    * semantic). */
  private[graft] def streamRoutedKeys: Set[String] = streamKeys.values.toSet

  /** Every verb-routed key across the dedup/knn/text maps — spec-
    * pinned to be registry members (third close-pass review: a
    * typo'd map value would otherwise compile and fail only at user
    * runtime). */
  private[graft] def verbRoutedKeys: Set[String] =
    (dedupKeys.values ++ knnKeys.values ++ textKeys.values).toSet ++
      // the verbs routed by literal, outside any map — same net
      Set("d_cluster", "d_canonical", "t_split")

  private val textKeys = Map(
    "quality" -> "t_quality", "langid" -> "t_langid", "tokens" -> "t_tokens",
    "repetition" -> "t_repetition", "readability" -> "t_readability",
    "fingerprint" -> "t_fingerprint", "scrub" -> "t_scrub",
    "bpe" -> "t_bpe_encode")

  private def route(what: String, m: Map[String, String], k: String): String =
    m.getOrElse(k, throw new IllegalArgumentException(
      s"unknown $what '$k' — one of: ${m.keys.toSeq.sorted.mkString(", ")}"))
}
