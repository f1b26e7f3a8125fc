package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-built repeated-span corpora for d_substring (D14 substring-
  * level dedup). Exact values at the data SFs are pinned by the
  * DuckDB oracle; these fix the SEMANTICS: cross-doc-only flagging,
  * anchor-union reconstruction of maximal spans, island splitting on
  * genuine gaps, and the per-doc mass arithmetic. Anchor width
  * SUBSTR_K = 8 tokens.
  */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_substr").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  private def run(dir: String): Map[Long, (Long, Long, Long, Long, Double)] =
    DedupPack.queries("d_substring")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

  private def span(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("a 10-token span shared by two docs is reconstructed exactly; unique and same-doc-repeat docs stay unflagged") {
    val s10 = span("s", 10)
    val dir = writeDocs(Seq(
      1L -> s"a1 a2 a3 $s10 b1 b2",           // 15 tokens, span at 4..13
      2L -> s"c1 c2 $s10 d1",                 // 13 tokens, span at 3..12
      3L -> span("u", 20),                    // nothing shared
      // the 8-token run r1..r8 repeats INSIDE one doc only — substring
      // dedup is cross-document, so this must not flag
      4L -> (span("r", 8) + " " + span("r", 8))))
    val out = run(dir)
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((15L, 1L, 10L, 10L, 10.0 / 15.0)))
    assert(out(2L) === ((13L, 1L, 10L, 10L, 10.0 / 13.0)))
  }

  test("two disjoint shared spans in one doc stay two islands; the shared mass sums") {
    val a = span("sa", 10); val b = span("sb", 10)
    val dir = writeDocs(Seq(
      1L -> s"x1 x2 x3 $a gap1 $b y1 y2",  // spans at 4..13 and 15..24
      2L -> s"z1 $a z2",                   // partner for span A
      3L -> s"w1 w2 $b"))                  // partner for span B
    val out = run(dir)
    val (n1, spans1, mass1, max1, ratio1) = out(1L)
    assert(n1 === 26L && spans1 === 2L && mass1 === 20L && max1 === 10L)
    assert(ratio1 === 20.0 / 26.0)
    assert(out(2L) === ((12L, 1L, 10L, 10L, 10.0 / 12.0)))
    assert(out(3L) === ((12L, 1L, 10L, 10L, 10.0 / 12.0)))
  }

  test("adjacent anchor intervals merge into ONE maximal span (12 tokens = 5 overlapping anchors)") {
    val s12 = span("m", 12)
    val dir = writeDocs(Seq(
      1L -> s"p1 $s12 q1 q2",
      2L -> s12))
    val out = run(dir)
    assert(out(1L) === ((15L, 1L, 12L, 12L, 12.0 / 15.0)))
    assert(out(2L) === ((12L, 1L, 12L, 12L, 1.0)))
  }

  test("a shared run shorter than SUBSTR_K is invisible") {
    val s7 = span("t", 7)
    val dir = writeDocs(Seq(
      1L -> s"a1 a2 $s7 a3 a4",
      2L -> s"b1 $s7 b2 b3 b4"))
    assert(run(dir).isEmpty)
  }

  test("sf data: masses are bounded, spans are at least anchor-wide, ratios in (0, 1]") {
    val out = DedupPack.queries("d_substring")(spark, sfDir).cache()
    assert(out.count() > 0)
    assert(out.filter($"dup_tokens" > $"n_tokens").count() === 0)
    assert(out.filter($"max_span" < 8L).count() === 0)
    assert(out.filter($"dup_ratio" <= 0.0 || $"dup_ratio" > 1.0).count() === 0)
    assert(out.filter($"max_span" > $"dup_tokens").count() === 0)
    out.unpersist()
  }
}
