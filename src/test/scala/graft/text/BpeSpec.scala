package graft.text

import java.util.Locale

import graft.{SparkEntry, SparkSpec, Tables}

/** F25 (round-13): BPE merge learning — the engine's learned merge
  * table pinned against an independent plain-JVM implementation of
  * the same contract (count adjacent distinct pairs → unique argmax
  * → window merge), plus the structural properties of a merge
  * table. */
class BpeSpec extends SparkSpec {

  private val STEPS = 6

  /** The whole trainer re-derived in plain Scala (spaces-only trim —
    * Spark/DuckDB trim semantics). */
  private def jvmBpe(): Seq[(Long, String, String, Long)] = {
    var seqs: Seq[Array[String]] = Tables.documents(spark, sfDir)
      .select("text").collect()
      .map(_.getString(0).replaceAll("^ +| +$", "").toLowerCase(Locale.ROOT)
        .replaceAll("\\s+", " ").split(" ", -1))
      .toSeq
    val learned = Seq.newBuilder[(Long, String, String, Long)]
    var k = 1L
    var done = false
    while (k <= STEPS && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { ws =>
        var i = 0
        while (i + 1 < ws.length) {
          if (ws(i) != ws(i + 1))
            counts((ws(i), ws(i + 1))) = counts.getOrElse((ws(i), ws(i + 1)), 0L) + 1
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        learned += ((k, l, r, c))
        seqs = seqs.map { ws =>
          val out = Seq.newBuilder[String]
          var i = 0
          while (i < ws.length) {
            if (i + 1 < ws.length && ws(i) == l && ws(i + 1) == r) {
              out += s"$l $r"; i += 2
            } else { out += ws(i); i += 1 }
          }
          out.result().toArray
        }
        k += 1
      }
    }
    learned.result()
  }

  test("t_bpe: the learned merge table equals the independent JVM trainer exactly") {
    val got = SparkEntry.queries("t_bpe")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val want = jvmBpe()
    assert(got === want)
    assert(got.size === STEPS, "the shipped corpus must sustain all merge steps")
  }

  test("t_bpe: merge-table structure — distinct rules, composable tokens, positive counts") {
    val rows = SparkEntry.queries("t_bpe")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1L to rows.length.toLong))
    assert(rows.map(t => (t._2, t._3)).distinct.length === rows.length,
      "a pair, once merged, can never be the argmax again")
    rows.foreach { case (_, l, r, c) =>
      assert(l !== r, "equal-token pairs are excluded by contract")
      assert(c > 0L)
    }
    // every later rule's sides are either corpus words or
    // concatenations of EARLIER-learned merges (the BPE vocabulary
    // closure property)
    val vocab = scala.collection.mutable.Set.empty[String]
    Tables.documents(spark, sfDir).select("text").collect().foreach(r =>
      r.getString(0).replaceAll("^ +| +$", "").toLowerCase(Locale.ROOT)
        .replaceAll("\\s+", " ").split(" ", -1).foreach(vocab += _))
    rows.foreach { case (_, l, r, _) =>
      Seq(l, r).foreach(side =>
        assert(vocab.contains(side), s"rule side '$side' not in the closed vocabulary"))
      vocab += s"$l $r"
    }
  }

  test("t_bpe: merging strictly shrinks the corpus token count by each rule's match count") {
    // after K merges the total token count must equal the original
    // minus Σ pair_count? NOT in general (later merges count pairs in
    // the ALREADY-merged stream — their matches each still remove
    // exactly one token). Verify the exact conservation:
    // tokens_after = tokens_before − Σ_k pair_count_k.
    val rows = SparkEntry.queries("t_bpe")(spark, sfDir).collect()
    val removed = rows.map(_.getLong(3)).sum
    val before = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).replaceAll("^ +| +$", "").toLowerCase(Locale.ROOT)
        .replaceAll("\\s+", " ").split(" ", -1).length.toLong).sum
    // replay the merges in-JVM and count what's left
    var seqs: Seq[Array[String]] = Tables.documents(spark, sfDir)
      .select("text").collect()
      .map(_.getString(0).replaceAll("^ +| +$", "").toLowerCase(Locale.ROOT)
        .replaceAll("\\s+", " ").split(" ", -1)).toSeq
    rows.sortBy(_.getLong(0)).foreach { r =>
      val (l, rr) = (r.getString(1), r.getString(2))
      seqs = seqs.map { ws =>
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < ws.length) {
          if (i + 1 < ws.length && ws(i) == l && ws(i + 1) == rr) {
            out += s"$l $rr"; i += 2
          } else { out += ws(i); i += 1 }
        }
        out.result().toArray
      }
    }
    assert(seqs.map(_.length.toLong).sum === before - removed,
      "every learned match must remove exactly one token")
  }
}
