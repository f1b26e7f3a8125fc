package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Community detection by synchronous label propagation (Raghavan et
  * al. 2007, the standard LPA) — the "which cluster does this entity
  * belong to" companion to [[ConnectedComponents]] (which only answers
  * "are they connected at all"). Every vertex starts labeled with its
  * own id; each round it adopts the most frequent label among its
  * neighbors, ties broken by the SMALLEST label — a deterministic
  * total order, so the fixed-iteration result is reproducible and
  * cross-engine checkable (plain LPA's random tie-breaks are not).
  * Vertices with no in-neighbors keep their current label.
  *
  * Scale shape: each round is one co-partitioned edges⋈labels join
  * and two partial-aggregable aggregations — (dst, label) counts,
  * then per-dst argmax via max(struct(count, -label)) — followed by a
  * left join back to the full vertex set; everything shuffles on the
  * vertex key, nothing is collected. Lineage is truncated per round
  * (lazy localCheckpoint), so K rounds cost K bounded stage chains at
  * any graph size. Rounds are FIXED (not run to convergence): LPA on
  * bidirectional graphs can oscillate under synchronous updates, so a
  * fixed-round contract is both the deterministic and the honest one.
  */
object LabelPropagation {

  def run(s: SparkSession, vertices: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    import s.implicits._
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // Derived once, hash-partitioned on the join key: localCheckpoint
    // preserves outputPartitioning, and the per-round join builds the
    // vertex-sized label vector (shuffle_hash hint) while STREAMING
    // the edges — no exchange and no per-round sort of the edge side.
    val e = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .repartition(col("src"))
      .localCheckpoint(false)
    var labels = vertices.select(col("id").cast("long").as("id"))
      .withColumn("label", $"id")
      .repartition(col("id"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val counts = e.join(labels.select($"id".as("src"), $"label").hint("shuffle_hash"), "src")
        .groupBy($"dst".as("id"), $"label").agg(count(lit(1)).as("c"))
      // mode with min-label tie-break: max over (count, -label)
      val upd = counts.groupBy($"id")
        .agg(max(struct($"c", (-$"label").as("nl"))).as("m"))
        .select($"id", (-$"m.nl").as("new_label"))
      labels = labels.join(upd.hint("shuffle_hash"), Seq("id"), "left")
        .select($"id", coalesce($"new_label", $"label").as("label"))
        .localCheckpoint(false)
    }
    labels
  }
}
