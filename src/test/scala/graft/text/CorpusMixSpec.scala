package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** F8 corpus mixing: deterministic per-source up/down-sampling.
  * Weights under test (TextPack.MIX_WEIGHTS): src0→2.5, src1→2.0,
  * src2→1.0, src3→0.75, src4→0.5, default 0.25. */
class CorpusMixSpec extends SparkSpec {

  private lazy val mix = TextPack.queries("t_mix")(spark, sfDir).cache()

  private def copiesOf(source: String) =
    mix.filter(col("source") === source).groupBy("doc_id")
      .agg(count(lit(1)).as("n"))

  test("integer weights replicate exactly: w=1.0 → 1 copy, w=2.0 → 2 copies") {
    assert(copiesOf("src2").filter(col("n") =!= 1L).count() === 0)
    assert(copiesOf("src1").filter(col("n") =!= 2L).count() === 0)
  }

  test("fractional weights emit floor or ceil copies only (w=2.5 → 2 or 3)") {
    assert(copiesOf("src0").filter(col("n") < 2L || col("n") > 3L).count() === 0)
  }

  test("downsampled sources keep a strict subset (w<1 → some docs dropped, none duplicated)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val kept = copiesOf("src3")
    assert(kept.filter(col("n") =!= 1L).count() === 0)
    val total = docs.filter(col("source") === "src3").count()
    assert(kept.count() < total && kept.count() > 0)
  }

  test("rep index is a dense 1..n sequence per doc") {
    val bad = mix.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), min("rep").as("lo"), max("rep").as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n"))
    assert(bad.count() === 0)
  }

  test("the mixture is deterministic (two runs agree row-for-row)") {
    val again = TextPack.queries("t_mix")(spark, sfDir)
    assert(mix.exceptAll(again).count() === 0)
    assert(again.exceptAll(mix).count() === 0)
  }

  test("t_pipeline: survivors only, train split only, copies follow the mix weights") {
    val p = TextPack.queries("t_pipeline")(spark, sfDir).cache()
    assert(p.count() > 0)
    assert(p.filter(col("split") =!= "train").count() === 0)
    // every emitted doc is its dedup group's survivor (min doc_id)
    val surv = graft.dedup.DedupPack.queries("d_exact")(spark, sfDir)
      .select(col("canonical_id").as("doc_id"))
    assert(p.select("doc_id").distinct().join(surv, Seq("doc_id"), "left_anti").count() === 0)
    // copies bounded by ceil(max weight)
    val copies = p.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(copies.filter(col("n") > 3L).count() === 0)
  }
}
