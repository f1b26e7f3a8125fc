package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** s_knn_ivfpq (E20): the IVF-PQ composition contracts on top of the
  * DuckDB oracle's exact pin — every emitted pair must come from a
  * probed cell, ADC distances must agree exactly with the full-PQ
  * key's for the same pair (same codebook, same codes), and the
  * composed results must be the cell-restriction of full PQ, never a
  * new distance. */
class IvfPqSpec extends SparkSpec {
  import spark.implicits._

  test("every emitted pair shares a probed cell, and ADC distances match full PQ exactly") {
    val out = SimilarityPack.queries("s_knn_ivfpq")(spark, sfDir)
      .select($"q_id", $"n_id", $"adc_dist").cache()
    assert(out.count() > 0)
    // cell containment: (q, n) only if n's cell is among q's probes
    val (ccell, qcell) = SimilarityPack.ivfAssign(
      graft.Tables.embeddings(spark, sfDir), SimilarityPack.N_QUERIES,
      SimilarityPack.NLIST, SimilarityPack.NPROBE)
    val legal = qcell.join(ccell, "cell").select($"q_id", $"n_id")
    assert(out.select($"q_id", $"n_id")
      .join(legal, Seq("q_id", "n_id"), "left_anti").count() === 0,
      "a pair escaped the probed cells")
    // ADC agreement: where full PQ ranked the same pair, the distance
    // is identical (the composition changes the CANDIDATE SET only)
    val pq = SimilarityPack.queries("s_knn_pq")(spark, sfDir)
      .select($"q_id", $"n_id", $"adc_dist".as("pq_dist"))
    val joined = out.join(pq, Seq("q_id", "n_id"))
    assert(joined.filter($"adc_dist" =!= $"pq_dist").count() === 0,
      "ADC distance diverged from the full-PQ evaluation")
    // the serving shape: exactly K rows per query, ranks 1..K
    val perQ = SimilarityPack.queries("s_knn_ivfpq")(spark, sfDir)
      .groupBy($"q_id").agg(count(lit(1)).as("n"), max($"rank").as("mx"))
    assert(perQ.filter($"n" =!= 5L || $"mx" =!= 5L).count() === 0)
    out.unpersist()
  }

  test("E21 refine: cell containment holds and recall never falls below plain IVF-PQ") {
    val refined = SimilarityPack.queries("s_knn_ivfpq_r")(spark, sfDir)
      .select($"q_id", $"n_id").cache()
    assert(refined.count() > 0)
    // the refine only RE-RANKS: every emitted pair still comes from a
    // probed cell (the candidate set is E20's, untouched)
    val (ccell, qcell) = SimilarityPack.ivfAssign(
      graft.Tables.embeddings(spark, sfDir), SimilarityPack.N_QUERIES,
      SimilarityPack.NLIST, SimilarityPack.NPROBE)
    val legal = qcell.join(ccell, "cell").select($"q_id", $"n_id")
    assert(refined.join(legal, Seq("q_id", "n_id"), "left_anti").count() === 0,
      "a refined pair escaped the probed cells")
    // exact re-rank at EQUAL candidate volume must not lose recall:
    // per query, |refined ∩ brute| >= |plain ivfpq ∩ brute| (the
    // verdict's done criterion, pinned at the shipped SF; the rungs
    // are measured by tools/RecallProbe — 0.52/0.34/0.68 vs
    // 0.16/0.06/0.64 at sf0.1/0.3x/1x)
    val brute = SimilarityPack.queries("s_knn_brute")(spark, sfDir)
      .select($"q_id", $"n_id").cache()
    def hitsPerQ(df: org.apache.spark.sql.DataFrame) =
      df.join(brute, Seq("q_id", "n_id"), "left_semi")
        .groupBy($"q_id").agg(count(lit(1)).as("h"))
    val plain = SimilarityPack.queries("s_knn_ivfpq")(spark, sfDir)
      .select($"q_id", $"n_id")
    val cmp = hitsPerQ(plain).withColumnRenamed("h", "hp")
      .join(hitsPerQ(refined).withColumnRenamed("h", "hr"), Seq("q_id"), "full_outer")
      .select(coalesce($"hp", lit(0L)).as("hp"), coalesce($"hr", lit(0L)).as("hr"))
    assert(cmp.filter($"hr" < $"hp").count() === 0,
      "refine lost recall vs plain IVF-PQ on some query")
    refined.unpersist(); brute.unpersist()
  }
}
