package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned corpus writer — the OUTPUT side of the training-data
  * pipeline (the reference persists results into SQLite tables,
  * main.py:143-153; a 100 TB corpus persists into a partitioned
  * columnar layout instead).
  *
  * Layout contract:
  *  - Hive-style directory partitioning on low-cardinality routing
  *    columns (split / lang): a trainer that reads one split touches
  *    only that subtree, and Spark's scan shows it as a
  *    PartitionFilters entry — zero data files from other partitions
  *    are opened (asserted by spec).
  *  - `sortWithinPartitions(doc_id)` inside each output task: row
  *    groups arrive min/max-indexed on doc_id, so point/range lookups
  *    skip row groups even within a partition.
  *  - `maxRecordsPerFile` bounds file size at fan-out time — the
  *    writer knob that prevents the classic too-few-giant-files /
  *    too-many-tiny-files cliff when one partition dominates (an
  *    80%-English corpus writes English as many bounded files, not
  *    one).
  */
object CorpusSink {

  /** Write `docs` partitioned by `partitionCols`, sorted inside each
    * file on `sortCol`.
    *
    * Distribution is `repartitionByRange` on (partitionCols :+
    * sortCol): a dominant partition (the 80%-English corpus) spans
    * MANY range slices split on sortCol, so write parallelism stays
    * at the session's partition count — a hash repartition on the
    * low-cardinality routing columns alone would collapse the write
    * to one task per (split, lang) combo. The explicit sort covers
    * the partition columns FIRST, satisfying the parquet writer's
    * required ordering, so Spark inserts no sort of its own above
    * the write and the sortCol order inside every file is the one
    * we specified (not an artifact of sort stability). */
  def write(docs: DataFrame, outDir: String,
            partitionCols: Seq[String] = Seq("split", "lang"),
            sortCol: String = "doc_id",
            maxRecordsPerFile: Long = 1000000L): Unit = {
    val keys = (partitionCols :+ sortCol).map(col)
    docs
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
  }

  /** Read a written corpus back (partition columns are restored from
    * the directory layout). */
  def read(s: SparkSession, dir: String): DataFrame = s.read.parquet(dir)
}
