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
  *   - [[run]]: every SURVEY §2 query key (172, DuckDB-oracled) by
  *     name — `db.run("d_minhash_lsh")`, `db.run("q_asof")` — over
  *     whatever tables this root holds. The full engine behind ONE
  *     method.
  *   - family verbs ([[dedup]], [[dupClusters]], [[canonical]],
  *     [[knn]], [[textSignals]], [[splitCorpus]]): named strategy →
  *     key routing for the four LLM-pipeline families, so the common
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
    *   - "sorted"    → sorted-neighborhood window pairs (D13) */
  def dedup(strategy: String = "minhash"): DataFrame =
    run(PipelineDB.route("dedup strategy", PipelineDB.dedupKeys, strategy))

  /** D6: near-dup candidates closed into clusters with survivors. */
  def dupClusters(): DataFrame = run("d_cluster")

  /** D10: keep-best representative per duplicate cluster. */
  def canonical(): DataFrame = run("d_canonical")

  /** Top-k similarity search over the imported `embeddings`, by
    * method: "brute" (E1 exact), "lsh" (E2), "ivf" (E3), "pq" (E5),
    * "binary" (E12), "filtered" (E13 metadata-predicated),
    * "maxsim" (E9 multi-vector late interaction). */
  def knn(method: String = "brute"): DataFrame =
    run(PipelineDB.route("knn method", PipelineDB.knnKeys, method))

  /** Text-quality signals over the imported `documents`, by signal:
    * "quality" (F2), "langid" (F3), "tokens" (F1), "repetition"
    * (F10), "readability" (F24), "fingerprint" (F4), "scrub" (F22). */
  def textSignals(signal: String = "quality"): DataFrame =
    run(PipelineDB.route("text signal", PipelineDB.textKeys, signal))

  /** F5: deterministic id-hash train/val/test assignment. */
  def splitCorpus(): DataFrame = run("t_split")

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
    "sorted" -> "d_sorted_nbr")

  private val knnKeys = Map(
    "brute" -> "s_knn_brute", "lsh" -> "s_knn_ann", "ivf" -> "s_knn_ivf",
    "pq" -> "s_knn_pq", "binary" -> "s_knn_binary",
    "filtered" -> "s_knn_filtered", "maxsim" -> "s_maxsim")

  private val textKeys = Map(
    "quality" -> "t_quality", "langid" -> "t_langid", "tokens" -> "t_tokens",
    "repetition" -> "t_repetition", "readability" -> "t_readability",
    "fingerprint" -> "t_fingerprint", "scrub" -> "t_scrub")

  private def route(what: String, m: Map[String, String], k: String): String =
    m.getOrElse(k, throw new IllegalArgumentException(
      s"unknown $what '$k' — one of: ${m.keys.toSeq.sorted.mkString(", ")}"))
}
