package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** D6 dup-cluster consolidation: the keep/drop decision must be the
  * transitive closure of the candidate pairs, with exactly one
  * survivor (min doc_id) per cluster. */
class DedupClusterSpec extends SparkSpec {

  private lazy val clusters =
    DedupPack.queries("d_cluster")(spark, sfDir).cache()
  private lazy val pairs =
    DedupPack.queries("d_minhash_lsh")(spark, sfDir).cache()

  test("every document gets exactly one cluster assignment") {
    val docs = graft.Tables.documents(spark, sfDir)
    assert(clusters.count() === docs.count())
    assert(clusters.select("doc_id").distinct().count() === docs.count())
  }

  test("paired documents land in the same cluster (transitive closure)") {
    val c = clusters.select(col("doc_id"), col("cluster_id"))
    val joined = pairs
      .join(c.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("cluster_id", "ca"), "doc_a")
      .join(c.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("cluster_id", "cb"), "doc_b")
    assert(joined.filter(col("ca") =!= col("cb")).count() === 0)
  }

  test("one survivor per cluster, and it is the minimum doc_id") {
    val perCluster = clusters.groupBy("cluster_id")
      .agg(sum(when(col("is_survivor"), 1L).otherwise(0L)).as("n_surv"),
        min("doc_id").as("min_id"))
    assert(perCluster.filter(col("n_surv") =!= 1L).count() === 0)
    assert(perCluster.filter(col("min_id") =!= col("cluster_id")).count() === 0)
  }

  test("cluster ids never exceed member ids (min-labeling contract)") {
    assert(clusters.filter(col("cluster_id") > col("doc_id")).count() === 0)
  }
}
