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

  /** Committed `v=<digits>` snapshot DIRECTORY versions under `root`
    * (compacted-away versions not included — see
    * [[committedVersions]]). Only directories carrying the writer's
    * `_SUCCESS` marker count: in-flight staging directories
    * (different name shape), failed writes (no marker) and foreign
    * entries (v=old, v=2.bak) are all ignored instead of poisoning
    * every reader. */
  private def dirVersions(s: SparkSession, root: String): Seq[Int] = {
    val p = new Path(root)
    val f = fs(s, root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath).toSeq
      .filter(q => q.getName.matches("v=\\d+") && f.exists(new Path(q, "_SUCCESS")))
      .map(_.getName.drop(2).toInt)
  }

  /** Committed compaction directories (`c=<maxV>-<k>` with
    * `_SUCCESS`), unordered and unvalidated — callers that need
    * coverage go through [[readableCompacts]]. */
  private def compactDirs(s: SparkSession, root: String): Seq[Path] = {
    val p = new Path(root)
    val f = fs(s, root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath).toSeq
      .filter(q => q.getName.matches("c=\\d+-\\d+") && f.exists(new Path(q, "_SUCCESS")))
  }

  /** Compaction directories WITH a readable, non-empty `_MANIFEST`,
    * paired with their coverage and sorted newest-coverage first —
    * by ACTUAL manifest content, never by directory name (round-13
    * review: a foreign `c=<bigN>-k`-shaped entry must not be able to
    * outrank the real compaction, disable [[vacuum]], or defeat
    * [[compact]]'s no-op check). */
  private def readableCompacts(s: SparkSession,
                               root: String): Seq[(Path, Seq[Int])] =
    compactDirs(s, root)
      .map(c => c -> manifest(s, root, c))
      .filter(_._2.nonEmpty)
      .sortBy { case (_, vs) => (-vs.max, -vs.size) }

  /** The version list a compaction directory covers, from its
    * `_MANIFEST` (one comma-separated line — the time-travel index
    * [[compact]] preserves). Empty for a missing or unparseable
    * manifest: a foreign/partial `c=N-k`-shaped entry must be IGNORED
    * like any other foreign directory, not poison every reader
    * through [[committedVersions]] (round-13 review — the same
    * contract [[dirVersions]] documents). */
  private def manifest(s: SparkSession, root: String, c: Path): Seq[Int] =
    try {
      val in = fs(s, root).open(new Path(c, "_MANIFEST"))
      try scala.io.Source.fromInputStream(in).mkString.trim
        .split(",").filter(_.nonEmpty).map(_.toInt).toSeq
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }

  /** Every readable snapshot version: live `v=N` directories plus
    * versions preserved inside compaction directories. */
  def committedVersions(s: SparkSession, root: String): Seq[Int] =
    (dirVersions(s, root) ++
      readableCompacts(s, root).flatMap(_._2)).distinct.sorted

  /** Latest committed snapshot version under `root`, 0 if none. */
  def latestVersion(s: SparkSession, root: String): Int =
    committedVersions(s, root).foldLeft(0)(math.max)

  private def snapshotPath(root: String, v: Int) = s"$root/v=$v"

  /** True iff `v=<v>` exists AND carries the `_SUCCESS` marker. */
  private def committed(s: SparkSession, root: String, v: Int): Boolean =
    fs(s, root).exists(new Path(new Path(snapshotPath(root, v)), "_SUCCESS"))

  /** Next writable version: one past the highest OCCUPIED `v=N` slot,
    * committed or not. A leftover uncommitted directory (crash before
    * _SUCCESS, manual junk like an aborted copy) is invisible to
    * readers but still occupies its name — advancing past it keeps the
    * store writable instead of every subsequent commit colliding with
    * the same dead slot forever. */
  private def nextVersion(s: SparkSession, root: String): Int = {
    val p = new Path(root)
    val f = fs(s, root)
    val occupied =
      if (!f.exists(p)) 0
      else f.listStatus(p).map(_.getPath)
        .filter(_.getName.matches("v=\\d+"))
        .map(_.getName.drop(2).toInt)
        .foldLeft(0)(math.max)
    // compacted-away versions stay occupied too: re-issuing a rolled
    // version number would let a new snapshot shadow history
    math.max(occupied, latestVersion(s, root)) + 1
  }

  /** Snapshot publish protocol: write to a staging directory invisible
    * to [[latestVersion]], then a single atomic rename exposes the
    * fully-written snapshot. A crash leaves only an ignored staging
    * dir; a concurrent committer loses the rename race and fails
    * loudly instead of silently overwriting. */
  private def commit(df: DataFrame, root: String, v: Int): Int = {
    val session = df.sparkSession
    val f = fs(session, root)
    val staging = new Path(s"$root/.staging-v$v-${java.util.UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(staging.toString)
    val target = new Path(snapshotPath(root, v))
    if (f.exists(target) || !f.rename(staging, target)) {
      f.delete(staging, true)
      throw new IllegalStateException(
        s"concurrent GraphStore commit: v=$v already exists under $root " +
          "(another writer won the rename race; retry to target the next version)")
    }
    v
  }

  /** First-seen-wins dedup on (src, dst) — attribute columns of the
    * surviving row come from the lowest `rank` source (0 = existing
    * store, 1 = delta), mirroring INSERT OR IGNORE. Ties within a
    * rank (duplicate key in one input) order by every attribute
    * column, so the survivor is deterministic across runs and
    * partitionings, not shuffle-order luck. */
  private def dedup(edges: DataFrame): DataFrame = {
    val attrs = edges.columns.filterNot(c => EDGE_COLS.contains(c) || c == "__rank")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"), col("dst"))
      .orderBy(col("__rank").asc +: attrs.map(col(_).asc): _*)
    edges
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((EDGE_COLS ++ attrs).map(col): _*)
  }

  /** Initialize (or reset) the store with `edges`; duplicates on
    * (src, dst) within the input keep an arbitrary-but-deterministic
    * first row. Returns the snapshot version written. */
  def write(edges: DataFrame, root: String): Int = {
    val v = nextVersion(edges.sparkSession, root)
    commit(dedup(edges.withColumn("__rank", lit(0))).repartition(col("src")), root, v)
  }

  /** INSERT-OR-IGNORE upsert: existing edges keep their attributes,
    * genuinely new (src, dst) pairs are appended. Returns the new
    * snapshot version. */
  def upsert(s: SparkSession, root: String, delta: DataFrame): Int = {
    require(latestVersion(s, root) > 0, s"GraphStore at $root is empty - call write() first")
    val existing = read(s, root).withColumn("__rank", lit(0))
    val incoming = delta.select(existing.columns.filter(_ != "__rank").map(col): _*)
      .withColumn("__rank", lit(1))
    commit(dedup(existing.unionByName(incoming)).repartition(col("src")), root,
      nextVersion(s, root))
  }

  /** Read the latest snapshot. */
  def read(s: SparkSession, root: String): DataFrame = {
    val v = latestVersion(s, root)
    require(v > 0, s"GraphStore at $root is empty")
    readVersion(s, root, v)
  }

  /** Read a specific snapshot version (snapshots are immutable, so
    * every historical version stays queryable — time travel, also
    * THROUGH [[compact]]ion: a rolled version reads as the interval
    * slice of its compaction directory). Version numbers may have
    * gaps where a dead uncommitted slot was skipped; only committed
    * snapshots are readable. */
  def readVersion(s: SparkSession, root: String, v: Int): DataFrame = {
    require(v > 0, s"no committed snapshot v=$v at $root")
    if (committed(s, root, v)) s.read.parquet(snapshotPath(root, v))
    else {
      val c = readableCompacts(s, root).collectFirst {
          case (p, vs) if vs.contains(v) => p
        }
        .getOrElse(throw new IllegalArgumentException(
          s"requirement failed: no committed snapshot v=$v at $root"))
      s.read.parquet(c.toString)
        .filter(col("__first") <= v && col("__last") >= v)
        .drop("__first", "__last")
    }
  }

  /** OPTIMIZE — roll every committed snapshot into ONE
    * interval-encoded dataset, preserving time travel (the lakehouse
    * maintenance primitive: N full-copy snapshot directories, each a
    * fleet of small part files, become a single compact dataset whose
    * size is the number of distinct (edge, attrs, presence-run)
    * intervals, not N × edges).
    *
    * Encoding: each surviving row carries `__first`/`__last` — the
    * raw version range of one CONTIGUOUS presence run (contiguity
    * over the committed-version sequence, so skipped dead slots
    * inside a run don't split it, and they stay unreadable because
    * the `_MANIFEST` — the comma-separated covered-version list —
    * never contains them). An edge that vanished in a [[write]] reset
    * and returned later, or returned with different attributes, gets
    * one row per run. [[readVersion]] of a rolled version is an
    * interval filter; [[diff]] composes unchanged.
    *
    * Publish protocol mirrors [[commit]]: staging write + `_MANIFEST`,
    * one atomic rename to `c=<maxV>-<k>`. Compaction DELETES NOTHING
    * (round-13 review): the rolled `v=N` directories stay readable —
    * [[readVersion]] prefers the directory copy — so a lazy DataFrame
    * held across the compact never loses its files. Space is
    * reclaimed by the separate [[vacuum]], the explicitly destructive
    * maintenance call (the OPTIMIZE / VACUUM split every table format
    * makes, for the same reader-isolation reason). Returns the number
    * of PRIOR DIRECTORIES (snapshot + compaction) rolled into the new
    * one — the count [[vacuum]] can then reclaim, not the count of
    * versions preserved (a rolled compaction carries many). */
  def compact(s: SparkSession, root: String): Int = {
    import org.apache.spark.sql.expressions.Window
    val versions = committedVersions(s, root)
    require(versions.nonEmpty, s"GraphStore at $root is empty")
    val priorDirs = dirVersions(s, root).sorted
    val priorCompacts = readableCompacts(s, root).map(_._1)
    // no-op when the newest READABLE compaction already covers every
    // committed version — nothing new to roll, vacuumed or not
    if (readableCompacts(s, root).headOption.exists(_._2.toSet == versions.toSet))
      return 0
    val f = fs(s, root)
    // dense index over the committed sequence defines run contiguity
    val idxDf = s.createDataFrame(versions.zipWithIndex.map {
      case (v, i) => (v, i.toLong)
    }).toDF("__v", "__vidx")
    val all = versions.map(v => readVersion(s, root, v).withColumn("__v", lit(v)))
      .reduce(_ unionByName _)
      .join(broadcast(idxDf), "__v")
    val dataCols = all.columns.filterNot(Seq("__v", "__vidx").contains).toSeq
    val w = Window.partitionBy(dataCols.map(col): _*).orderBy(col("__vidx"))
    val runs = all
      .withColumn("__run", col("__vidx") - row_number().over(w))
      .groupBy(dataCols.map(col) :+ col("__run"): _*)
      .agg(min(col("__v")).as("__first"), max(col("__v")).as("__last"))
      .drop("__run")
      .repartition(col("src"))
    val staging = new Path(s"$root/.staging-c-${java.util.UUID.randomUUID()}")
    runs.write.mode("overwrite").parquet(staging.toString)
    val mf = f.create(new Path(staging, "_MANIFEST"))
    try mf.write(versions.mkString(",").getBytes("UTF-8")) finally mf.close()
    val maxV = versions.max
    val target = Iterator.from(0).map(k => new Path(s"$root/c=$maxV-$k"))
      .find(!f.exists(_)).get
    if (!f.rename(staging, target)) {
      f.delete(staging, true)
      throw new IllegalStateException(
        s"concurrent GraphStore compact under $root (rename race; retry)")
    }
    priorDirs.size + priorCompacts.size
  }

  /** VACUUM — delete snapshot directories and superseded compaction
    * directories whose versions are fully covered by the NEWEST
    * committed compaction directory. Destructive by design: a reader
    * whose lazy DataFrame still references a covered `v=N` directory
    * will fail once its files vanish — run it when no readers hold
    * pre-vacuum plans (the retention decision every table format's
    * VACUUM delegates to the operator). Time travel itself is
    * unaffected: every covered version remains readable through the
    * compaction directory. Returns the number of directories
    * deleted. */
  def vacuum(s: SparkSession, root: String): Int = {
    val f = fs(s, root)
    readableCompacts(s, root) match {
      case (_, newestCover) +: rest =>
        val covered = newestCover.toSet
        val deadDirs = dirVersions(s, root).filter(covered.contains)
        // only compactions whose coverage is KNOWN (readable,
        // non-empty manifest) and fully subsumed may die — an
        // unreadable manifest means unknown contents, and deleting
        // unknown contents is the opposite of the ignore-foreign-
        // entries contract (round-13 review)
        val deadCompacts = rest.collect {
          case (c, vs) if vs.forall(covered.contains) => c
        }
        deadDirs.foreach(v => f.delete(new Path(snapshotPath(root, v)), true))
        deadCompacts.foreach(c => f.delete(c, true))
        deadDirs.size + deadCompacts.size
      case _ => 0 // nothing compacted ⇒ nothing is redundant
    }
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
