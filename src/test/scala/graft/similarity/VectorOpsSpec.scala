package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {

  test("dotDec and normDec compute exact values on known vectors") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val (dot, na) = df.select(VectorOps.dotDec("a", "b"), VectorOps.normDec("a"))
      .as[(Double, Double)].head()
    assert(dot === 32.0)
    assert(math.abs(na - math.sqrt(14.0)) < 1e-12)
  }

  test("signatures are deterministic bit strings of the plane count") {
    import spark.implicits._
    val e = Seq((1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)), (3L, Seq(-1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val sigs = VectorOps.signatures(e, "vec_id", 8)
      .as[(Long, String)].collect().toMap
    assert(sigs(1L).length === 8)
    assert(sigs(1L) === sigs(2L)) // identical vectors, identical signature
    assert(sigs(1L) !== sigs(3L))
  }

  test("ann recall@5 vs brute force is at least 0.9 on the test corpus") {
    val brute = SimilarityPack.queries("s_knn_brute")(spark, sfDir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SimilarityPack.queries("s_knn_ann")(spark, sfDir)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute & ann).size.toDouble / brute.size.toDouble
    assert(recall >= 0.9, s"recall@5 = $recall")
  }
}
