package graft.streaming

import java.nio.file.{Files, Path}

import graft.SparkSpec
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** File-source streaming ingest: discovery of newly landed files and
  * exactly-once resumption from the checkpoint across restarts — the
  * production corpus-ingest shape (H4's source/sink edge). */
class StreamingIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  private def drop(dir: Path, name: String, rows: (Long, String)*): Unit =
    Files.write(dir.resolve(name),
      rows.map { case (i, n) => s"""{"id":$i,"name":"$n"}""" }.mkString("", "\n", "\n")
        .getBytes("UTF-8"))

  test("jsonl stream resumes exactly-once across restarts") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-stream-ingest")
    val in = Files.createDirectory(root.resolve("in"))
    val out = root.resolve("out").toString
    val ck = root.resolve("ck").toString

    def runOnce(): Unit = {
      val q = StreamingIngest.toParquet(
        StreamingIngest.jsonl(spark, in.toString, schema), out, ck)
      try q.processAllAvailable() finally q.stop()
    }

    drop(in, "batch1.jsonl", (1L, "alpha"), (2L, "beta"))
    runOnce()
    assert(spark.read.schema(schema).parquet(out).as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta")))

    // New file lands while the query is DOWN; restart must pick up
    // only the new file — batch1 is in the checkpoint, so emitting it
    // again would break the file sink's exactly-once contract.
    drop(in, "batch2.jsonl", (3L, "gamma"))
    runOnce()
    val all = spark.read.schema(schema).parquet(out).as[(Long, String)].collect().toSeq
    assert(all.sorted === Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")),
      s"expected exactly-once resumption, got $all")
  }
}
