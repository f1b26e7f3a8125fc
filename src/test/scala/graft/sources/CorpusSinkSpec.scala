package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Corpus sink: partitioned layout, round-trip fidelity, and
  * partition pruning in the read-back scan. */
class CorpusSinkSpec extends SparkSpec {

  private lazy val outDir = {
    val dir = Files.createTempDirectory("corpus_sink").toString
    val docs = graft.Tables.documents(spark, sfDir)
      .join(graft.text.TextPack.queries("t_split")(spark, sfDir), "doc_id")
    CorpusSink.write(docs, dir)
    dir
  }

  test("round-trip preserves every row") {
    val n = graft.Tables.documents(spark, sfDir).count()
    assert(CorpusSink.read(spark, outDir).count() === n)
  }

  test("the layout is hive-partitioned by split then lang") {
    val splits = new java.io.File(outDir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(splits.nonEmpty && splits.forall(_.startsWith("split=")))
    val langs = new java.io.File(outDir, splits.head).listFiles()
      .filter(_.isDirectory).map(_.getName)
    assert(langs.nonEmpty && langs.forall(_.startsWith("lang=")))
  }

  test("a split filter becomes a PartitionFilters entry, not a data filter") {
    val q = CorpusSink.read(spark, outDir).filter(col("split") === "train")
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters") &&
      physical.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("split"),
      s"expected split to prune partitions:\n$physical")
    // and the filtered count matches the unpruned predicate count
    val full = CorpusSink.read(spark, outDir)
    assert(q.count() === full.filter(col("split") === "train").count())
  }

  test("rows are sorted on doc_id within each data file") {
    import scala.jdk.CollectionConverters._
    val dataFiles = Files.walk(java.nio.file.Paths.get(outDir)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .map(_.toString).toSeq
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val ids = spark.read.parquet(f).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"unsorted file: $f")
    }
  }
}
