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

  /** The engine's tokenization, mirrored once for every test:
    * spaces-only trim (Spark/DuckDB trim semantics), ROOT lowercase,
    * whitespace collapse, space split. */
  private def tokens(text: String): Array[String] =
    text.replaceAll("^ +| +$", "").toLowerCase(Locale.ROOT)
      .replaceAll("\\s+", " ").split(" ", -1)

  private def corpus(): Seq[Array[String]] =
    Tables.documents(spark, sfDir).select("text").collect()
      .map(r => tokens(r.getString(0))).toSeq

  /** Apply one merge rule left-to-right (l ≠ r ⇒ no overlap). */
  private def applyMerge(seqs: Seq[Array[String]], l: String, r: String): Seq[Array[String]] =
    seqs.map { ws =>
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < ws.length) {
        if (i + 1 < ws.length && ws(i) == l && ws(i + 1) == r) {
          out += s"$l $r"; i += 2
        } else { out += ws(i); i += 1 }
      }
      out.result().toArray
    }

  /** CODE-POINT string order — the order Spark's UTF8String binary
    * comparison and DuckDB's default collation both implement.
    * java.lang.String's natural order is UTF-16 code-unit order,
    * which ranks supplementary-plane characters BELOW U+E000–U+FFFF
    * (round-13 third review pass). */
  private val cpOrder: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  /** The whole trainer re-derived in plain Scala. */
  private def jvmBpe(): Seq[(Long, String, String, Long)] = {
    implicit val ord: Ordering[String] = cpOrder
    var seqs = corpus()
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
        val ((l, r), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }(
          Ordering.Tuple3(Ordering.Long, ord, ord))
        learned += ((k, l, r, c))
        seqs = applyMerge(seqs, l, r)
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
    corpus().foreach(_.foreach(vocab += _))
    rows.foreach { case (_, l, r, _) =>
      Seq(l, r).foreach(side =>
        assert(vocab.contains(side), s"rule side '$side' not in the closed vocabulary"))
      vocab += s"$l $r"
    }
  }

  test("t_bpe: every learned match removes exactly one token (conservation law)") {
    val rows = SparkEntry.queries("t_bpe")(spark, sfDir).collect()
    val removed = rows.map(_.getLong(3)).sum
    var seqs = corpus()
    val before = seqs.map(_.length.toLong).sum
    rows.sortBy(_.getLong(0)).foreach { r =>
      seqs = applyMerge(seqs, r.getString(1), r.getString(2))
    }
    assert(seqs.map(_.length.toLong).sum === before - removed,
      "every learned match must remove exactly one token")
  }
}
