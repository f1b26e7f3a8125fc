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
}
