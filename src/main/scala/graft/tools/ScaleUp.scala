package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives a TIMING-ONLY scale-ladder corpus by key-shifted
  * replication of a shipped SF directory (round-6/7 verdict item #1:
  * the 100 TB arguments need measured per-key scaling ratios above
  * sf0.1, and /root/testdata tops out there).
  *
  * Replication discipline — the point is that fact-scale costs grow
  * like a real bigger dataset, not like a pathological one:
  *
  *   - `region`/`nation` are FIXED dimensions (as in TPC-H scaling):
  *     the nation trade graph stays 25 nodes at every SF; what grows
  *     is the lineitem evidence underneath it.
  *   - fact tables (`customer supplier part orders lineitem events`)
  *     replicate with all entity keys offset by replica·1e8 — key
  *     spaces stay disjoint, join fan-outs and group cardinalities
  *     grow linearly. Attributes are unchanged, so `part` classes
  *     (brand, size) keep a CONSTANT class count with 3× members —
  *     the dimension-bounded shape the quotient fast paths rely on,
  *     and the shape a real catalog has.
  *   - `documents.text` is DECORRELATED per replica by a
  *     deterministic alphabet rotation (letters by 7·i, digits by
  *     3·i): length, whitespace, punctuation and token boundaries are
  *     preserved bit-for-bit (token/quality/chunking costs scale
  *     purely with row count) while shingles, minhashes and
  *     fingerprints diverge — a naive copy would make EVERY document
  *     an exact dup of its replicas and blow the dedup keys up
  *     quadratically in ways a real 3× corpus never would.
  *   - `embeddings.embedding` is decorrelated per replica (replica
  *     ≡ 1 mod 3: odd dimensions negated; ≡ 2: vector reversed) —
  *     norm-preserving isometries, so cosine structure stays
  *     realistic instead of every vector gaining perfect duplicates.
  *
  * NOT a correctness corpus: the DuckDB oracle is never run against
  * it (the driver's gate stays sf0.01; the sf0.1 ledger is §6).
  */
object ScaleUp {

  private val LETTERS_LOWER = "abcdefghijklmnopqrstuvwxyz"
  private val LETTERS_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
  private val DIGITS = "0123456789"
  private val FROM = LETTERS_LOWER + LETTERS_UPPER + DIGITS

  private def rotated(i: Int): String = {
    def rot(s: String, k: Int) = { val m = ((k % s.length) + s.length) % s.length; s.drop(m) + s.take(m) }
    rot(LETTERS_LOWER, 7 * i) + rot(LETTERS_UPPER, 7 * i) + rot(DIGITS, 3 * i)
  }

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/scale/sf0.3x"
    val n = if (args.length > 2) args(2).toInt else 3
    val s = graft.GraftSession.local(defaultCpus = "32")
    import s.implicits._

    val OFF = 100000000L
    def off(i: Int, cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(OFF * i)))

    def replicate(table: String, perReplica: (DataFrame, Int) => DataFrame): Unit = {
      val base = s.read.parquet(s"$src/$table.parquet")
      val all = (0 until n).map(i => perReplica(base, i)).reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"[scaleup] $table: ${all.count()} rows -> $out/$table.parquet")
    }

    // fixed dimensions: copied once, unscaled
    Seq("region", "nation").foreach { t =>
      s.read.parquet(s"$src/$t.parquet").write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    replicate("customer", (d, i) => off(i, "c_custkey")(d))
    replicate("supplier", (d, i) => off(i, "s_suppkey")(d))
    replicate("part", (d, i) => off(i, "p_partkey")(d))
    replicate("orders", (d, i) => off(i, "o_orderkey", "o_custkey")(d))
    replicate("lineitem", (d, i) => off(i, "l_orderkey", "l_partkey", "l_suppkey")(d))
    replicate("events", (d, i) => off(i, "event_id", "user_id")(d))
    replicate("documents", (d, i) =>
      off(i, "doc_id")(d).withColumn("text",
        if (i == 0) $"text" else translate($"text", FROM, rotated(i))))
    replicate("embeddings", (d, i) =>
      off(i, "vec_id")(d).withColumn("embedding", i % 3 match {
        case 0 => $"embedding"
        case 1 => transform($"embedding", (x, j) =>
          when(pmod(j, lit(2)) === 1, -x).otherwise(x))
        case _ => reverse($"embedding")
      }))
    s.stop()
  }
}
