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
    intercept[SparkException] {
      Ingest.csv(spark, bad, schema).collect()
    }
  }

  test("jsonl reads schema-explicit and fails fast on malformed rows") {
    import spark.implicits._
    val good = tmpFile("good.jsonl", """{"id":1,"name":"alpha"}""" + "\n" + """{"id":2,"name":"beta"}""" + "\n")
    assert(Ingest.jsonl(spark, good, schema).as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta")))

    val bad = tmpFile("bad.jsonl", """{"id":1,"name":"alpha"}""" + "\n" + "{broken\n")
    intercept[SparkException] {
      Ingest.jsonl(spark, bad, schema).collect()
    }
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
