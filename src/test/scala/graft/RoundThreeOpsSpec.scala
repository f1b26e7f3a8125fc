package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the round-3 operators (F10 repetition, H6
  * retention, H7 pivot, D7 semantic dedup, E5 product quantization).
  * The exact-value verification is the DuckDB oracle; these assert the
  * semantic invariants a refactor could silently break. */
class RoundThreeOpsSpec extends SparkSpec {

  test("t_repetition: ratios in range, flag consistent with its thresholds") {
    val r = graft.text.TextPack.queries("t_repetition")(spark, sfDir).cache()
    assert(r.count() === Tables.documents(spark, sfDir).count())
    val badRange = r.filter(
      col("distinct_ratio") <= 0.0 || col("distinct_ratio") > 1.0 ||
        col("top_word_frac") <= 0.0 || col("top_word_frac") > 1.0 ||
        col("top_bigram_frac") < 0.0 || col("top_bigram_frac") > 1.0)
    assert(badRange.count() === 0)
    // the flag is exactly the disjunction of the three thresholds
    val badFlag = r.filter(col("repetitive") =!=
      (col("top_word_frac") > 0.12 || col("top_bigram_frac") > 0.05 ||
        col("distinct_ratio") < 0.4))
    assert(badFlag.count() === 0)
    // a doc's most frequent word can't be rarer than uniform
    assert(r.filter(col("top_word_frac") * col("n_toks") < 1.0).count() === 0)
  }

  test("e_retention: every cohort has a day-0 row and counts never exceed cohort size") {
    val ret = graft.streaming.EventsPack.queries("e_retention")(spark, sfDir).cache()
    val day0 = ret.filter(col("day_offset") === 0L)
      .select(col("cohort_day"), col("n_users").as("cohort_size"))
    // offsets are non-negative and every cohort appears at offset 0
    assert(ret.filter(col("day_offset") < 0L).count() === 0)
    assert(ret.select("cohort_day").distinct().count() === day0.count())
    val tooBig = ret.join(day0, "cohort_day")
      .filter(col("n_users") > col("cohort_size"))
    assert(tooBig.count() === 0)
  }

  test("e_pivot: one row per user; per-type counts sum to the user's event count") {
    val p = graft.streaming.EventsPack.queries("e_pivot")(spark, sfDir).cache()
    val events = Tables.events(spark, sfDir)
    assert(p.count() === events.select("user_id").distinct().count())
    val totals = events.groupBy("user_id").agg(count(lit(1)).as("n_total"))
    val mismatch = p
      .withColumn("n_sum",
        col("click_n") + col("error_n") + col("purchase_n") + col("signup_n") + col("view_n"))
      .join(totals, "user_id")
      .filter(col("n_sum") =!= col("n_total"))
    assert(mismatch.count() === 0)
  }

  test("d_semantic: one row per vector, sims in [-1,1], exactly one survivor per dup group") {
    val sem = graft.dedup.DedupPack.queries("d_semantic")(spark, sfDir).cache()
    assert(sem.count() === Tables.embeddings(spark, sfDir).count())
    assert(sem.filter(abs(col("centroid_sim")) > 1.0).count() === 0)
    // all seed centroids assign to themselves with sim 1
    assert(sem.filter(col("vec_id") < 8 && col("cluster_id") =!= col("vec_id")).count() === 0)
    // vectors under the threshold are always kept
    assert(sem.filter(col("centroid_sim") < 0.3 && !col("is_kept")).count() === 0)
    // per cluster, exactly one kept row among the flagged (>= tau) set
    val dupKept = sem.filter(col("centroid_sim") >= 0.3)
      .groupBy("cluster_id")
      .agg(sum(when(col("is_kept"), 1L).otherwise(0L)).as("n_kept"))
    assert(dupKept.filter(col("n_kept") =!= 1L).count() === 0)
  }

  test("s_knn_pq: dense ranks, k rows per query, ADC self-distance-free and self-consistent") {
    val pq = graft.similarity.SimilarityPack.queries("s_knn_pq")(spark, sfDir).cache()
    val perQ = pq.groupBy("q_id").agg(count(lit(1)).as("n"),
      min("rank").as("lo"), max("rank").as("hi"))
    assert(perQ.filter(col("n") =!= 5L || col("lo") =!= 1L || col("hi") =!= 5L).count() === 0)
    assert(pq.filter(col("q_id") === col("n_id")).count() === 0)
    assert(pq.filter(col("adc_dist") < 0.0).count() === 0)
    // ranks follow ascending ADC distance within each query
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("rank").asc)
    val nonMono = pq.withColumn("prev", lag("adc_dist", 1).over(w))
      .filter(col("prev").isNotNull && col("adc_dist") < col("prev"))
    assert(nonMono.count() === 0)
  }
}
