package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling (C27) — the data-quality / catalog-stats
  * primitive: per column null count, EXACT distinct count, and typed
  * min/max, in ONE pass over the table.
  *
  * Scale shape: the multi-distinct aggregate plans as Catalyst's
  * Expand — one stream per distinct column riding a SINGLE shuffle
  * with map-side partial dedup — the canonical exact-NDV plan (an
  * approx profile would use HLL sketches instead, C10's territory);
  * null counts and min/max ride the same pass, so the table is
  * scanned exactly once however many columns it has.
  *
  * Output stringification is type-pinned so it hash-matches
  * cross-engine: timestamps/dates as yyyy-MM-dd, floating point
  * through DECIMAL(18,2) (fixed-format decimal printing, never
  * shortest-roundtrip double repr, which Java and DuckDB disagree
  * on for values like 1e7), integers/strings verbatim. */
object Profiler {
  private val D = DecimalType(18, 2)

  /** Backtick-quoted reference — a column (or templated alias) whose
    * NAME contains a dot would otherwise parse as struct-field access
    * and crash the generic helper. */
  private def q(name: String): Column = col(s"`$name`")

  /** @return one row per column of `t`:
    *         (col_name, n_rows, n_nulls, n_distinct, min_value, max_value). */
  def profile(t: DataFrame): DataFrame = {
    def asStr(c: Column, dt: DataType) = dt match {
      case TimestampType | TimestampNTZType | DateType => date_format(c, "yyyy-MM-dd")
      case DoubleType | FloatType => c.cast(D).cast("string")
      case _ => c.cast("string")
    }
    val fields = t.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      Seq(sum(when(q(f.name).isNull, 1L).otherwise(0L)).as(s"__nn_${f.name}"),
        countDistinct(q(f.name)).as(s"__nd_${f.name}"),
        asStr(min(q(f.name)), f.dataType).as(s"__mn_${f.name}"),
        asStr(max(q(f.name)), f.dataType).as(s"__mx_${f.name}"))
    }
    val one = t.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val rows = fields.map { f =>
      struct(lit(f.name).as("col_name"),
        q(s"__nn_${f.name}").as("n_nulls"),
        q(s"__nd_${f.name}").as("n_distinct"),
        q(s"__mn_${f.name}").as("min_value"),
        q(s"__mx_${f.name}").as("max_value"))
    }
    one.select(col("n_rows"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_name"), col("n_rows"), col("p.n_nulls"),
        col("p.n_distinct"), col("p.min_value"), col("p.max_value"))
  }
}
