package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKByScoreSpec extends SparkSpec {

  test("keeps the k best by (score desc, id asc), merged across partitions") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      (1L, 0.9, 10L), (1L, 0.9, 3L), (1L, 0.5, 7L), (1L, 0.99, 2L), (1L, 0.1, 1L),
      (2L, 0.2, 5L),
    )
    val df = rows.toDF("g", "score", "id").repartition(4)
    val got = df.groupBy($"g")
      .agg(GraftFunctions.topK($"score", $"id", 3).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "t")))
      .select($"g", $"pos", $"t.score", $"t.id")
      .as[(Long, Int, Double, Long)].collect().sortBy(r => (r._1, r._2))
    // group 1: 0.99/2, then tie 0.9 broken by id asc (3 before 10)
    assert(got.toSeq === Seq(
      (1L, 0, 0.99, 2L), (1L, 1, 0.9, 3L), (1L, 2, 0.9, 10L),
      // group 2 has fewer than k rows: all of them, in order
      (2L, 0, 0.2, 5L)))
  }

  test("null scores and ids are skipped") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, Some(0.5), Some(1L)), (1L, None, Some(2L)), (1L, Some(0.9), None),
    ).toDF("g", "score", "id")
    val got = df.groupBy($"g")
      .agg(GraftFunctions.topK($"score", $"id", 5).as("tk"))
      .select(size($"tk")).as[Int].head()
    assert(got === 1)
  }

  test("matches a row_number window on the brute-force knn query") {
    import spark.implicits._
    // Cross-check the aggregate against the independent window
    // formulation on real data.
    val viaAgg = graft.similarity.SimilarityPack.queries("s_knn_brute")(spark, sfDir)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().toSet
    val e = graft.Tables.embeddings(spark, sfDir)
      .withColumn("nrm", graft.similarity.VectorOps.normDec("embedding"))
    graft.functions.GraftFunctions.register(spark)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
    val c = e.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_id").orderBy($"cosine".desc, $"n_id".asc)
    val viaWindow = c.crossJoin(broadcast(q)).filter($"q_id" =!= $"n_id")
      .withColumn("cosine",
        graft.similarity.VectorOps.dotDecFast($"qe", $"ne") / ($"qn" * $"nn"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 5)
      .select("q_id", "rank", "n_id").as[(Long, Long, Long)].collect().toSet
    assert(viaAgg === viaWindow)
  }
}
