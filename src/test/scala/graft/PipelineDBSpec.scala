package graft

import org.apache.spark.sql.functions._

/** The pipeline front door (round-11, verdict #7): import-then-query
  * must behave exactly like the verified query keys over the same
  * data — the facade adds routing and validation, never semantics. */
class PipelineDBSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("pipelinedb").toString

  test("imported tables round-trip: facade answers equal the keys over the source dir") {
    val root = freshRoot()
    val db = new PipelineDB(spark, root)
    db.importDocuments(Tables.documents(spark, sfDir))
    db.importEmbeddings(Tables.embeddings(spark, sfDir))
    // the facade runs the SAME operator over the imported copy
    val viaDb = db.dedup("exact").collect().map(_.toSeq).toSet
    val direct = SparkEntry.queries("d_exact")(spark, sfDir).collect().map(_.toSeq).toSet
    assert(viaDb === direct)
    val knnDb = db.knn("brute").collect().map(_.toSeq).toSet
    val knnDirect = SparkEntry.queries("s_knn_brute")(spark, sfDir).collect().map(_.toSeq).toSet
    assert(knnDb === knnDirect)
    assert(db.textSignals("langid").collect().map(_.toSeq).toSet ===
      SparkEntry.queries("t_langid")(spark, sfDir).collect().map(_.toSeq).toSet)
  }

  test("run() exposes every shipped key; unknown keys and strategies fail loudly") {
    val db = new PipelineDB(spark, freshRoot())
    assert(db.keys.size === SparkEntry.queries.size)
    assert(db.keys.contains("q1_pricing") && db.keys.contains("e_stream_window"))
    val e = intercept[IllegalArgumentException](db.run("no_such_key"))
    assert(e.getMessage.contains("unknown query key"))
    val e2 = intercept[IllegalArgumentException](db.dedup("fuzzy"))
    assert(e2.getMessage.contains("unknown dedup strategy"))
    val e3 = intercept[IllegalArgumentException](db.knn("faiss"))
    assert(e3.getMessage.contains("unknown knn method"))
  }

  test("import validates table names and required columns before anything is written") {
    import spark.implicits._
    val db = new PipelineDB(spark, freshRoot())
    val e = intercept[IllegalArgumentException](
      db.importTable("corpus", Seq((1L, "x")).toDF("doc_id", "text")))
    assert(e.getMessage.contains("unknown table"))
    val e2 = intercept[IllegalArgumentException](
      db.importDocuments(Seq((1L, "x")).toDF("doc_id", "text")))
    assert(e2.getMessage.contains("missing required column"))
  }

  test("sql() serves ANSI SQL over the imported tables") {
    val root = freshRoot()
    val db = new PipelineDB(spark, root)
    db.importDocuments(Tables.documents(spark, sfDir))
    val n = db.sql("SELECT COUNT(*) AS n FROM documents").head().getLong(0)
    assert(n === Tables.documents(spark, sfDir).count())
  }

  test("media features need no import: the G2 seam takes any (id, payload) dataset") {
    import spark.implicits._
    val db = new PipelineDB(spark, freshRoot())
    val out = db.features(Seq(1L -> "hello world".getBytes("UTF-8")).toDS())
    assert(out.select(size(col("features"))).head().getInt(0) ===
      graft.multimodal.Decode.DIM)
  }
}
