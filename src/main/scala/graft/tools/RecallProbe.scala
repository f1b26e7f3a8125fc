package graft.tools
import org.apache.spark.sql.functions._
/** Measures E11/E15 ANN recall AT the scale-ladder rungs (round-14
  * verdict optional 8): the recall keys are hash-verified at the
  * shipped SFs; this runs them on the derived rungs so the
  * bucketed-ANN quality story at scale is measured, not argued. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local("32")
    args.foreach { d =>
      Seq("s_recall", "s_matryoshka").foreach { key =>
        val r = graft.SparkEntry.queries(key)(s, d)
          .agg(avg(col("recall")).as("mean"), min(col("recall")).as("min"),
            count(lit(1)).as("n")).head()
        // an empty rung aggregates to (null, null, 0) — report it
        // instead of tripping over getDouble(null)
        if (r.getLong(2) == 0L) println(s"RECALL dir=$d key=$key n=0 (no queries)")
        else println(f"RECALL dir=$d key=$key mean=${r.getDouble(0)}%.4f min=${r.getDouble(1)}%.4f n=${r.getLong(2)}")
      }
    }
    s.stop()
  }
}
