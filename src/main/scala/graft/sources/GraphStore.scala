package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistent property-graph store — the Spark-native analog of the
  * reference's SQLite `PersistentDataBase` (main.py:117-210): a
  * parquet-backed bidirectional edge table with UNIQUE(src, dst)
  * identity and INSERT-OR-IGNORE upsert semantics (main.py:203's
  * `INSERT OR IGNORE`, main.py:143-153's UNIQUE constraint).
  *
  * Storage layout is versioned snapshots (`v=1`, `v=2`, …) under one
  * root: an upsert reads the latest snapshot, unions the delta,
  * dedups on (src, dst) keeping the FIRST-seen attribute row (the
  * OR-IGNORE rule: existing edges win), and writes the next version —
  * parquet is immutable, so snapshot-then-advance is the idiomatic
  * warehouse shape (what table formats do under the hood), and
  * readers are never exposed to a half-written update.
  *
  * Scale shape: the dedup is one hash shuffle on (src, dst); the
  * write is hash-partitioned by `src` so degree scans and
  * frontier-join BFS read co-partitioned data. No driver-side state.
  */
object GraphStore {

  private val EDGE_COLS = Seq("src", "dst")

  private def fs(s: SparkSession, root: String) =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Latest snapshot version under `root`, 0 if none. */
  def latestVersion(s: SparkSession, root: String): Int = {
    val p = new Path(root)
    val f = fs(s, root)
    if (!f.exists(p)) 0
    else f.listStatus(p).map(_.getPath.getName)
      .filter(_.startsWith("v=")).map(_.drop(2).toInt)
      .foldLeft(0)(math.max)
  }

  private def snapshotPath(root: String, v: Int) = s"$root/v=$v"

  /** First-seen-wins dedup on (src, dst) — attribute columns of the
    * surviving row come from the lowest `rank` source (0 = existing
    * store, 1 = delta), mirroring INSERT OR IGNORE. */
  private def dedup(edges: DataFrame): DataFrame = {
    val attrs = edges.columns.filterNot(c => EDGE_COLS.contains(c) || c == "__rank")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"), col("dst"))
      .orderBy(col("__rank").asc)
    edges
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((EDGE_COLS ++ attrs).map(col): _*)
  }

  /** Initialize (or reset) the store with `edges`; duplicates on
    * (src, dst) within the input keep an arbitrary-but-deterministic
    * first row. Returns the snapshot version written. */
  def write(edges: DataFrame, root: String): Int = {
    val v = latestVersion(edges.sparkSession, root) + 1
    dedup(edges.withColumn("__rank", lit(0)))
      .repartition(col("src"))
      .write.mode("overwrite").parquet(snapshotPath(root, v))
    v
  }

  /** INSERT-OR-IGNORE upsert: existing edges keep their attributes,
    * genuinely new (src, dst) pairs are appended. Returns the new
    * snapshot version. */
  def upsert(s: SparkSession, root: String, delta: DataFrame): Int = {
    val v = latestVersion(s, root)
    require(v > 0, s"GraphStore at $root is empty - call write() first")
    val existing = read(s, root).withColumn("__rank", lit(0))
    val incoming = delta.select(existing.columns.filter(_ != "__rank").map(col): _*)
      .withColumn("__rank", lit(1))
    dedup(existing.unionByName(incoming))
      .repartition(col("src"))
      .write.mode("overwrite").parquet(snapshotPath(root, v + 1))
    v + 1
  }

  /** Read the latest snapshot. */
  def read(s: SparkSession, root: String): DataFrame = {
    val v = latestVersion(s, root)
    require(v > 0, s"GraphStore at $root is empty")
    s.read.parquet(snapshotPath(root, v))
  }

  /** Read a specific snapshot version (snapshots are immutable, so
    * every historical version stays queryable — time travel). */
  def readVersion(s: SparkSession, root: String, v: Int): DataFrame = {
    require(v > 0 && v <= latestVersion(s, root), s"no snapshot v=$v at $root")
    s.read.parquet(snapshotPath(root, v))
  }

  /** Edge diff between two snapshots: (src, dst, change) with change
    * 'added' or 'removed' (upserts only add, but [[write]] resets, so
    * both directions exist). One anti-join per direction on the
    * (src, dst) identity — no full-table comparison state. */
  def diff(s: SparkSession, root: String, fromV: Int, toV: Int): DataFrame = {
    val from = readVersion(s, root, fromV).select("src", "dst")
    val to = readVersion(s, root, toV).select("src", "dst")
    to.join(from, EDGE_COLS, "left_anti").withColumn("change", lit("added"))
      .unionByName(
        from.join(to, EDGE_COLS, "left_anti").withColumn("change", lit("removed")))
  }
}
