package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftExpressionsSpec extends SparkSpec {

  test("DotQuant matches the quantization contract on known vectors") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
      (Seq(0.1f, -0.2f), Seq(0.3f, 0.4f)),
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.dotQuant($"a", $"b")).as[Double].collect()
    assert(got(0) === 32.0)
    // Reference computation, same contract: floor(p*1e12 + 0.5) per
    // element, exact long sum, /1e12.
    val exp1 = (math.floor(0.1f.toDouble * 0.3f.toDouble * 1e12 + 0.5).toLong +
      math.floor(-0.2f.toDouble * 0.4f.toDouble * 1e12 + 0.5).toLong).toDouble / 1e12
    assert(got(1) === exp1)
  }

  test("DotQuant handles length mismatch (common prefix) and nulls") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(
      (Some(Seq(1.0f, 2.0f, 9.0f)), Some(Seq(3.0f, 4.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f))),
    ).toDF("a", "b")
    val got = df.select(GraftFunctions.dotQuant($"a", $"b")).collect()
    assert(got(0).getDouble(0) === 11.0)
    assert(got(1).isNullAt(0))
  }

  test("HammingDist counts differing positions, codegen and SQL paths") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(("10110", "10011"), ("0000", "0000"), ("1", "0")).toDF("a", "b")
    val got = df.select(GraftFunctions.hamming($"a", $"b")).as[Long].collect()
    assert(got.toSeq === Seq(2L, 0L, 1L))
    // SQL route resolves through the session registry too.
    val viaSql = spark.sql("SELECT graft_hamming('abc', 'abd')").as[Long].head()
    assert(viaSql === 1L)
  }

  test("expressions survive interpreted (non-codegen) evaluation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val df = Seq((Seq(1.0f, 1.0f), Seq(1.0f, 1.0f), "101", "100")).toDF("a", "b", "x", "y")
      val r = df.select(GraftFunctions.dotQuant($"a", $"b"),
        GraftFunctions.hamming($"x", $"y")).as[(Double, Long)].head()
      assert(r === ((2.0, 1L)))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
