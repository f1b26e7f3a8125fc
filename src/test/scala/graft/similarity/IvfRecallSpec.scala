package graft.similarity

import graft.SparkSpec

import scala.util.Random

/** IVF ANN recall on CLUSTERED vectors — the data shape the inverted
  * index is built for (the synthetic `embeddings` table is uniform
  * random, the known worst case for any space partitioner, so recall
  * is asserted here instead). Ground truth is an independent local
  * brute-force pass, not another Spark query. */
class IvfRecallSpec extends SparkSpec {

  private val DIM = 16
  private val CLUSTERS = 8
  private val N = 200
  private val N_QUERIES = 10
  private val K = 5

  /** vec_id % CLUSTERS picks the cluster, so the first 16 ids (the
    * deterministic IVF centroids) cover every cluster twice. */
  private def clusteredVectors(): Seq[(Long, Seq[Float])] = {
    val rng = new Random(4711)
    val centers = Vector.fill(CLUSTERS)(Array.fill(DIM)(rng.nextGaussian()))
    (0L until N.toLong).map { id =>
      val c = centers((id % CLUSTERS).toInt)
      id -> c.map(x => (x + 0.15 * rng.nextGaussian()).toFloat).toSeq
    }
  }

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    dot / math.sqrt(na * nb)
  }

  test("IVF top-5 recall >= 0.9 vs local brute force on 8-cluster data") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val data = clusteredVectors()
    val df = data.toDF("vec_id", "embedding")

    val got = SimilarityPack.ivfTopK(df, N_QUERIES, nlist = 16, nprobe = 4, k = K)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap

    val byId = data.toMap
    var hit = 0
    var total = 0
    (0L until N_QUERIES.toLong).foreach { qid =>
      val truth = data.collect { case (id, v) if id != qid => id -> cosine(byId(qid), v) }
        .sortBy { case (id, c) => (-c, id) }.take(K).map(_._1).toSet
      hit += truth.intersect(got.getOrElse(qid, Set.empty)).size
      total += K
    }
    val recall = hit.toDouble / total
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("IVF results are a subset of scored candidates with correct ranks") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = clusteredVectors().toDF("vec_id", "embedding")
    val rows = SimilarityPack.ivfTopK(df, 3, nlist = 16, nprobe = 4, k = K).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq === (1L to byRank.length))
      // scores non-increasing in rank
      byRank.map(_.getDouble(3)).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a >= b)
        case _ => ()
      }
    }
  }
}
