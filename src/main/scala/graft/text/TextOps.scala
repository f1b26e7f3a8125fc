package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis packs.
  *
  * Everything here is a plain Catalyst column expression (whole-stage
  * codegen'd, no UDFs) and has an exact DuckDB SQL equivalent so the
  * oracle can recompute identical values:
  *   norm      = regexp_replace(lower(trim(text)), '\s+', ' ', 'g')
  *   words     = string_split(norm, ' ')
  *   shingle i = w[i] || ' ' || w[i+1] || ' ' || w[i+2]   (1-based)
  */
object TextOps {

  /** Whitespace-collapsed, lowercased, trimmed text. */
  def norm(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def words(text: Column): Column = split(norm(text), " ")

  /** All 3-word shingles (1-based sliding window, matching the
    * oracle's list indexing). Empty array when fewer than 3 words. */
  def shingles3(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** md5 hex digest of a string column (UTF-8 bytes — identical to
    * DuckDB's md5(varchar)). */
  def md5s(c: Column): Column = md5(c.cast("binary"))
}
