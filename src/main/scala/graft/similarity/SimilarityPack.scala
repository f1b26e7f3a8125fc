package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Similarity-search pack (SURVEY §2 E1–E2) over `embeddings`.
  *
  * E1 is the correctness baseline: brute-force cosine top-k with the
  * scale-correct plan shape — the (small) query set is broadcast
  * against the corpus scan, cosine is computed map-side, and the
  * per-query top-k is one hash-partitioned window. No corpus×corpus
  * shuffle anywhere.
  *
  * E2 is the scale path: random-hyperplane LSH (16 deterministic
  * md5-sign planes, 8 bands × 2 bits) buckets the corpus; each query
  * only scores candidates sharing a band key. On uniform-random
  * vectors (this synthetic table — the known worst case for LSH) the
  * 2-bit bands are deliberately permissive to keep recall ≥ 0.9; on
  * real clustered embeddings the same plan with wider bands prunes
  * aggressively. Both queries are fully deterministic, so BOTH get
  * exact SQL oracles; the recall spec lives in the test suite.
  */
object SimilarityPack extends QueryPack {

  private val K = 5
  private val N_QUERIES = 10 // query set: vec_id < 10
  private val PLANES = 16
  private val BANDS = 8

  /** Per-query top-k via the bounded [[graft.functions.TopKByScore]]
    * aggregate: each map partition reduces to ≤ K entries per query
    * before the exchange, so the shuffle carries O(queries × K) rows —
    * a ROW_NUMBER window would shuffle and sort the entire candidate
    * set. Same (cosine DESC, n_id ASC) total order as the oracle. */
  private def topK(pairs: DataFrame): DataFrame =
    pairs.groupBy(col("q_id"))
      .agg(graft.functions.GraftFunctions.topK(col("cosine"), col("n_id"), K).as("tk"))
      .select(col("q_id"), posexplode(col("tk")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rank"),
        col("t.id").as("n_id"), col("t.score").as("cosine"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1: brute-force cosine top-k per query vector.
    "s_knn_brute" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val q = e.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      val c = e.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
      topK(c.crossJoin(broadcast(q))
        .filter($"q_id" =!= $"n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn")))
    },

    // E2: LSH-bucketed ANN top-k — score only same-band candidates.
    "s_knn_ann" -> { (s, d) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val e = Tables.embeddings(s, d).withColumn("nrm", VectorOps.normDec("embedding"))
      val bands = VectorOps.bandKeys(
        VectorOps.signatures(Tables.embeddings(s, d), "vec_id", PLANES),
        "vec_id", PLANES, BANDS)
      val qb = bands.filter($"vec_id" < N_QUERIES).select($"vec_id".as("q_id"), $"b", $"bv")
      val cand = qb.join(bands, Seq("b", "bv"))
        .filter($"q_id" =!= $"vec_id")
        .select($"q_id", $"vec_id".as("n_id"))
        .distinct()
      val q = e.filter($"vec_id" < N_QUERIES)
        .select($"vec_id".as("q_id"), $"embedding".as("qe"), $"nrm".as("qn"))
      val c = e.select($"vec_id".as("n_id"), $"embedding".as("ne"), $"nrm".as("nn"))
      topK(cand.join(broadcast(q), "q_id").join(c, "n_id")
        .withColumn("cosine", VectorOps.dotDecFast(col("qe"), col("ne")) / ($"qn" * $"nn")))
    },
  )

  /** Shared oracle CTEs for dims / norms. */
  private val dimsSql =
    """dims AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      |         FROM embeddings, UNNEST(range(1, len(embedding)+1)) t(i)),
      |nrm AS (SELECT vec_id, sqrt(CAST(SUM(CAST(x*x AS DECIMAL(28,12))) AS DOUBLE)) AS n
      |        FROM dims GROUP BY vec_id)""".stripMargin

  override def oracles: Map[String, String] = Map(
    "s_knn_brute" ->
      s"""WITH $dimsSql,
         |dot AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(SUM(CAST(floor(q.x * c.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM dims q JOIN dims c ON q.i = c.i AND q.vec_id <> c.vec_id
         |        WHERE q.vec_id < $N_QUERIES
         |        GROUP BY q.vec_id, c.vec_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranked AS (SELECT q_id, n_id, cosine,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM cosv)
         |SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= $K""".stripMargin,
    "s_knn_ann" -> {
      val width = PLANES / BANDS
      s"""WITH $dimsSql,
         |proj AS (
         | SELECT vec_id, j,
         |  CASE WHEN SUM(CAST(floor((CASE WHEN substr(md5(j || '_' || i), 1, 1) < '8' THEN x ELSE -x END) * 1e12 + 0.5) AS BIGINT)) >= 0
         |   THEN '1' ELSE '0' END AS bit
         | FROM dims, UNNEST(range(1, ${PLANES + 1})) tj(j) GROUP BY vec_id, j),
         |sig AS (SELECT vec_id, string_agg(bit, '' ORDER BY j) AS sg FROM proj GROUP BY vec_id),
         |bands AS (SELECT vec_id, b, substr(sg, (b-1)*$width + 1, $width) AS bv
         |          FROM sig, UNNEST(range(1, ${BANDS + 1})) tb(b)),
         |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
         |         FROM bands q JOIN bands c ON q.b = c.b AND q.bv = c.bv AND q.vec_id <> c.vec_id
         |         WHERE q.vec_id < $N_QUERIES),
         |dot AS (SELECT cd.q_id, cd.n_id, CAST(SUM(CAST(floor(dq.x * dc.x * 1e12 + 0.5) AS BIGINT)) AS DOUBLE) / 1e12 AS dp
         |        FROM cand cd JOIN dims dq ON dq.vec_id = cd.q_id
         |         JOIN dims dc ON dc.vec_id = cd.n_id AND dc.i = dq.i
         |        GROUP BY cd.q_id, cd.n_id),
         |cosv AS (SELECT d.q_id, d.n_id, d.dp / (nq.n * nc.n) AS cosine
         |         FROM dot d JOIN nrm nq ON nq.vec_id = d.q_id JOIN nrm nc ON nc.vec_id = d.n_id),
         |ranked AS (SELECT q_id, n_id, cosine,
         |            CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS BIGINT) AS rank
         |           FROM cosv)
         |SELECT q_id, rank, n_id, cosine FROM ranked WHERE rank <= $K""".stripMargin
    },
  )
}
