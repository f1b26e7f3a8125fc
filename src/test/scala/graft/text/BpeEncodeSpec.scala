package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** t_bpe_encode (F26): the apply half of the BPE tokenizer. The
  * DuckDB oracle cross-checks the encoder against the trainer's
  * final sequences at the data SFs; these specs pin the semantics on
  * hand corpora via an INDEPENDENT replay that mirrors the engine's
  * single-pass mark/consume algebra (marks computed on the sequence
  * state BEFORE the pass, rules applied in learned step order), plus
  * the token-conservation identity. */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_enc").toString
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  /** Independent replay of ONE merge pass: mark every i with
    * (tok_i, tok_i+1) = (l, r) against the ORIGINAL sequence, drop
    * every position consumed by the mark to its left. l != r makes
    * marks non-adjacent, so simultaneous marking is unambiguous —
    * the engine's window-algebra contract. */
  private def applyRule(toks: Vector[String], l: String, r: String): Vector[String] = {
    val mark = toks.indices.map(i =>
      i + 1 < toks.length && toks(i) == l && toks(i + 1) == r)
    toks.indices.collect {
      case i if !(i > 0 && mark(i - 1)) =>
        if (mark(i)) s"$l $r" else toks(i)
    }.toVector
  }

  private def replay(text: String, rules: Seq[(String, String)]): Vector[String] =
    rules.foldLeft(text.split(" ").toVector) { case (t, (l, r)) => applyRule(t, l, r) }

  test("hand corpus: encoder output matches an independent greedy replay of the learned table") {
    // 'x y' dominates (6 occurrences), then 'y z' inherits nothing
    // (every y merged), so step 2 merges the next-best pair — the
    // replay derives expectations from the LEARNED table, not a guess
    val dir = writeDocs(Seq(
      1L -> "x y z x y z x y w",
      2L -> "x y z x y z q q2",
      3L -> "a b a b x y"))
    val rules = TextPack.queries("t_bpe")(spark, dir)
      .orderBy($"step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val out = TextPack.queries("t_bpe_encode")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val texts = Map(1L -> "x y z x y z x y w",
      2L -> "x y z x y z q q2", 3L -> "a b a b x y")
    texts.foreach { case (id, text) =>
      val enc = replay(text, rules)
      val nRaw = text.split(" ").length.toLong
      val (gRaw, gEnc, gMerged, gHash) = out(id)
      assert(gRaw === nRaw, s"doc $id raw")
      assert(gEnc === enc.length.toLong, s"doc $id encoded")
      assert(gMerged === nRaw - enc.length, s"doc $id merged")
      assert(gHash === graft.util.Md5.hex(enc.mkString("|")), s"doc $id hash")
    }
    // the dominant pair really is the first rule, and it merged
    assert(rules.head === (("x", "y")))
    assert(out(1L)._3 >= 3L)
  }

  test("a corpus with no repeated pair encodes as the identity") {
    val dir = writeDocs(Seq(1L -> "a b c d e", 2L -> "f g h i"))
    val out = TextPack.queries("t_bpe_encode")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // SOME rules are still learned (count-1 pairs), but each doc's
    // merged mass is bounded by its own pair occurrences; conservation
    // holds regardless
    out.foreach { case (_, (nRaw, nEnc, nMerged)) =>
      assert(nEnc + nMerged === nRaw && nEnc >= 1L)
    }
  }

  test("sf data: token conservation and sequence-hash determinism across reruns") {
    val a = TextPack.queries("t_bpe_encode")(spark, sfDir)
    assert(a.filter($"n_encoded" + $"n_merged" =!= $"n_raw").count() === 0)
    assert(a.filter($"n_merged" < 0L).count() === 0)
    val b = TextPack.queries("t_bpe_encode")(spark, sfDir)
    assert(a.select($"doc_id", $"seq_hash").except(
      b.select($"doc_id", $"seq_hash")).count() === 0)
  }
}
