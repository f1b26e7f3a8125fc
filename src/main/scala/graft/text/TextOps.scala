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

  /** [[norm]]'s DuckDB twin — ONE definition for every oracle that
    * tokenizes `documents.text` (TextPack's F-family and E17's BM25),
    * so the two packs can never drift on normalization. */
  val nrmSql: String = """regexp_replace(lower(trim(text)),'\s+',' ','g')"""

  /** Whitespace tokens of the normalized text. */
  def words(text: Column): Column = split(norm(text), " ")

  /** All 3-word shingles (1-based sliding window, matching the
    * oracle's list indexing). Empty array when fewer than 3 words.
    * A Scala UDF rather than transform/element_at: higher-order
    * functions are interpreted per element (12 s for one pass over
    * the sf0.1 corpus vs <1 s here), and the shingle explode feeds
    * several downstream stages. */
  private val shingles3Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { w: Seq[String] =>
      if (w.length < 3) Seq.empty[String]
      else w.sliding(3).map(_.mkString(" ")).toSeq
    }

  def shingles3(w: Column): Column = shingles3Udf(w)

  /** md5 hex digest of a string column (UTF-8 bytes — identical to
    * DuckDB's md5(varchar)). */
  def md5s(c: Column): Column = md5(c.cast("binary"))

  /** Winnowing fingerprints: md5 over every k-char gram of the
    * normalized text, then the minimum hash of each w-gram window,
    * deduplicated. Identical to the oracle's
    * list_transform/list_min formulation (md5hex lowercase = both
    * engines' md5). One tight pass instead of an interpreted
    * per-position lambda with md5 inside it. */
  def winnowUdf(k: Int, w: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { nrm: String =>
      if (nrm == null || nrm.length < k + w - 1) Seq.empty[String]
      else {
        // graft.util.Md5: ThreadLocal digest — no per-row (let alone
        // per-gram) MessageDigest allocation.
        val grams = Array.tabulate(nrm.length - k + 1)(i => graft.util.Md5.hex(nrm.substring(i, i + k)))
        val out = scala.collection.mutable.LinkedHashSet.empty[String]
        var p = 0
        while (p + w <= grams.length) {
          var m = grams(p)
          var q = p + 1
          while (q < p + w) { if (grams(q) < m) m = grams(q); q += 1 }
          out += m
          p += 1
        }
        out.toSeq
      }
    }

  /** Hamming distance between two equal-length bit strings — the
    * native codegen'd Catalyst expression
    * [[graft.functions.HammingDist]] (same count the oracle computes
    * with list_filter over positions). Callers must have run
    * [[graft.functions.GraftFunctions.register]] on the session. */
  def hamming(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.hamming(a, b)

  /** PII-class scrub stages: (category, pattern, replacement token),
    * applied strictly in declaration order — each category counts and
    * redacts on the PREVIOUS stage's output, so an overlapping match
    * (the digits inside an email or an IP) is attributed to the
    * earliest category exactly once and never double-redacted.
    * Patterns stay inside the syntax intersection of Java regex
    * (Spark) and RE2 (the DuckDB oracle): character classes,
    * bounded repetition, groups and \b only — no backreferences or
    * lookaround, which RE2 rejects. */
  val scrubStages: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("number", "[0-9]+", "<NUM>"),
  )

  /** Apply [[scrubStages]] to `df`'s `textCol`: appends one
    * `n_<category>` BIGINT count per stage plus the fully-redacted
    * text as `redacted` and a `clean` verdict. Pure row-local
    * codegen'd regex work — zero shuffle at any scale. */
  def scrub(df: org.apache.spark.sql.DataFrame, textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, regexp_count, regexp_replace}
    val staged = scrubStages.foldLeft(df.withColumn("__cur", col(textCol))) {
      case (acc, (cat, pat, repl)) =>
        acc.withColumn(s"n_$cat", regexp_count(col("__cur"), lit(pat)).cast("long"))
          .withColumn("__cur", regexp_replace(col("__cur"), pat, repl))
    }
    staged
      .withColumn("redacted", col("__cur"))
      .withColumn("clean",
        scrubStages.map { case (cat, _, _) => col(s"n_$cat") }.reduce(_ + _) === lit(0L))
      .drop("__cur")
  }
}
