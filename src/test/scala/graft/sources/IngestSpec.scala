package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

class IngestSpec extends SparkSpec {

  private def tmpFile(name: String, content: String): String = {
    val p = Files.createTempDirectory("graft-ingest").resolve(name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType)))

  test("csv reads schema-explicit and fails fast on malformed rows") {
    import spark.implicits._
    val good = tmpFile("good.csv", "id,name\n1,alpha\n2,beta\n")
    assert(Ingest.csv(spark, good, schema).as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta")))

    val bad = tmpFile("bad.csv", "id,name\n1,alpha\nnot_a_number,beta\n")
    // scoped: only this FAILFAST read's task failure is expected
    expectTaskFailures(intercept[SparkException] {
      Ingest.csv(spark, bad, schema).collect()
    })
  }

  test("jsonl reads schema-explicit and fails fast on malformed rows") {
    import spark.implicits._
    val good = tmpFile("good.jsonl", """{"id":1,"name":"alpha"}""" + "\n" + """{"id":2,"name":"beta"}""" + "\n")
    assert(Ingest.jsonl(spark, good, schema).as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta")))

    val bad = tmpFile("bad.jsonl", """{"id":1,"name":"alpha"}""" + "\n" + "{broken\n")
    // scoped: only this FAILFAST read's task failure is expected
    expectTaskFailures(intercept[SparkException] {
      Ingest.jsonl(spark, bad, schema).collect()
    })
  }

  test("orc round-trips with an explicit schema") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-orc").resolve("t.orc").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
      .write.mode("overwrite").orc(dir)
    assert(Ingest.orc(spark, dir, schema).as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta")))
  }

  test("binaryFiles reads undecoded payloads with listing-level glob pruning") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bin")
    Files.write(dir.resolve("a.img"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.img"), "media-bytes".getBytes("UTF-8"))
    Files.write(dir.resolve("skip.txt"), "not media".getBytes("UTF-8"))
    val rows = Ingest.binaryFiles(spark, dir.toString, glob = "*.img")
      .select("uri", "n_bytes", "payload")
      .as[(String, Long, Array[Byte])].collect().sortBy(_._1)
    assert(rows.length === 2, "glob must prune skip.txt at the listing")
    assert(rows.map(r => r._1.split('/').last).toSeq === Seq("a.img", "b.img"))
    assert(rows(0)._3.toSeq === Seq[Byte](1, 2, 3, 4) && rows(0)._2 === 4L)
    assert(new String(rows(1)._3, "UTF-8") === "media-bytes")
  }

  test("textLines yields content-addressed ids, skips blanks, collides exact dups") {
    import spark.implicits._
    val p = tmpFile("corpus.txt", "hello world\n\nsecond doc\nhello world\n")
    val rows = Ingest.textLines(spark, p).as[(String, String)].collect()
    assert(rows.length === 3) // blank skipped, dup kept as a row
    val byId = rows.groupBy(_._1)
    assert(byId.size === 2, "exact duplicates must share a doc_id")
    assert(rows.map(_._2).count(_ == "hello world") === 2)
    // ids are deterministic across re-reads
    val again = Ingest.textLines(spark, p).as[(String, String)].collect()
    assert(again.map(_._1).sorted.toSeq === rows.map(_._1).sorted.toSeq)
  }
}
