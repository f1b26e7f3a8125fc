package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("norm lowercases, trims, collapses whitespace") {
    import spark.implicits._
    val got = Seq("  Hello   WORLD\tfoo ").toDF("t")
      .select(TextOps.norm($"t")).as[String].head()
    assert(got === "hello world foo")
  }

  test("shingles3 produces 1-based sliding 3-word windows") {
    import spark.implicits._
    val got = Seq("a b c d").toDF("t")
      .select(TextOps.shingles3(TextOps.words($"t"))).as[Seq[String]].head()
    assert(got === Seq("a b c", "b c d"))
  }

  test("shingles3 is empty below 3 words") {
    import spark.implicits._
    val got = Seq("a b").toDF("t")
      .select(TextOps.shingles3(TextOps.words($"t"))).as[Seq[String]].head()
    assert(got === Seq.empty)
  }

  test("md5s matches the known md5 of the utf-8 bytes") {
    import spark.implicits._
    val got = Seq("abc").toDF("t").select(TextOps.md5s($"t")).as[String].head()
    assert(got === "900150983cd24fb0d6963f7d28e17f72")
  }

  test("t_readability: counts on a punctuated sentence and the pinned Flesch order") {
    import spark.implicits._
    // run the SAME column expressions the query uses on a known doc
    val got = Seq("The cat sat. It ate a big fish! Did it?").toDF("text")
      .select(
        greatest(lit(1L),
          size(regexp_extract_all($"text", lit("[.!?]+"), lit(0))).cast("long")).as("s"),
        size(split(TextOps.norm($"text"), " ")).cast("long").as("w"),
        size(regexp_extract_all(lower($"text"), lit("[aeiouy]+"), lit(0))).cast("long").as("y"))
      .head()
    assert(got.getLong(0) === 3L) // ". " "!" "?"
    assert(got.getLong(1) === 10L)
    // vowel runs: e,a,a,i,a,e,a,i,i,i,i (one per syllable here) = 11
    assert(got.getLong(2) === 11L)
    // and the sf0.001 query reproduces the formula bit-for-bit from its own counts
    val rows = graft.SparkEntry.queries("t_readability")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s1, w, y, f) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      val expect = 206.835 - 1.015 * (w.toDouble / s1.toDouble) - 84.6 * (y.toDouble / w.toDouble)
      assert(f === expect, s"doc ${r.getLong(0)}")
    }
  }
}
