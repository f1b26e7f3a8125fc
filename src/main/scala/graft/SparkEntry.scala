package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All query packs; each covers a section of SURVEY.md §2. */
  private def packs: Seq[QueryPack] = Seq(
    graft.relational.RelationalPack,
    graft.graph.GraphPack,
    graft.graph.SubgraphPack,
    graft.dedup.DedupPack,
    graft.text.TextPack,
    graft.similarity.SimilarityPack,
    graft.streaming.EventsPack,
    graft.multimodal.MultimodalPack,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * (lazy val: callers index into this repeatedly — Bench three
    * times per query — so the merge + duplicate-key check run once.) */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val flat = packs.flatMap(_.queries)
    val merged = flat.toMap
    require(flat.size == merged.size,
      s"duplicate query keys across packs: ${flat.map(_._1).diff(merged.keys.toSeq).distinct.mkString(", ")}")
    merged
  }

  /** Keys driven through the chunked streaming-replay harness — see
    * [[QueryPack.replayBackedKeys]]. Bench pre-stages the replay feed
    * when any of these are in the run and reports their operator share
    * against the measured harness floor. */
  lazy val replayBackedKeys: Set[String] = {
    val keys = packs.flatMap(_.replayBackedKeys).toSet
    require(keys.subsetOf(queries.keySet),
      s"replay-backed keys not in queries: ${(keys -- queries.keySet).mkString(", ")}")
    keys
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = {
    val flat = packs.flatMap(_.oracles)
    val merged = flat.toMap
    require(flat.size == merged.size,
      s"duplicate oracle keys across packs: ${flat.map(_._1).diff(merged.keys.toSeq).distinct.mkString(", ")}")
    merged
  }
}
