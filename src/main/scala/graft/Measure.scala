package graft

/** THE measurement protocol, single-sourced: Bench and
  * tools.EngineLadder must time identically or the side-by-side
  * growth-law comparison in SCALING.md silently desynchronizes (the
  * round-8 review finding that created this object). */
private[graft] object Measure {

  /** Materialize every result row via the noop sink — the full
    * projected result is computed (unlike `.count()`, which lets
    * Catalyst prune the plan down to an agg-of-agg). */
  def materialize(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Millisecond precision, locale-pinned (a comma decimal separator
    * would make the emitted JSON invalid). */
  def ms(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }
}
