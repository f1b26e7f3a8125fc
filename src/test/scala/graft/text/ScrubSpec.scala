package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** F22 pattern scrubbing: detection + redaction on a hand-built PII
  * corpus (the test tables carry no real PII, so the query key only
  * proves the no-false-positive side; this corpus proves detection,
  * ordering, and redaction identity). */
class ScrubSpec extends SparkSpec {

  private def scrubbed(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextOps.scrub(rows.toDF("id", "text"), "text")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_email"), r.getAs[Long]("n_ipv4"), r.getAs[Long]("n_number")),
          r.getAs[String]("redacted"), r.getAs[Boolean]("clean")))
      .toMap
  }

  test("scrub detects and redacts each category, attributing overlaps to the earliest stage") {
    val out = scrubbed(Seq(
      1L -> "contact alice.smith+x@example.com or bob@test.org today",
      2L -> "server at 192.168.1.254 timed out, retry 10.0.0.1",
      3L -> "order 12345 shipped 2024 units",
      4L -> "mail admin99@host42.net from 172.16.254.3 re ticket 77",
      5L -> "nothing sensitive here at all",
    ))
    assert(out(1L) === (((2L, 0L, 0L), "contact <EMAIL> or <EMAIL> today", false)))
    assert(out(2L) === (((0L, 2L, 0L), "server at <IP> timed out, retry <IP>", false)))
    assert(out(3L) === (((0L, 0L, 2L), "order <NUM> shipped <NUM> units", false)))
    // digits inside the email/IP must be consumed by those stages,
    // never double-counted by the numeric stage
    assert(out(4L) === (((1L, 1L, 1L), "mail <EMAIL> from <IP> re ticket <NUM>", false)))
    assert(out(5L) === (((0L, 0L, 0L), "nothing sensitive here at all", true)))
  }

  test("clean text passes through byte-identical and the t_scrub key flags every props row") {
    import spark.implicits._
    val texts = Seq(1L -> "the quick brown fox", 2L -> "no digits anywhere")
    val out = scrubbed(texts)
    texts.foreach { case (id, t) => assert(out(id)._2 === t) }
    // every synthetic props payload carries a number → nothing clean,
    // exactly one <NUM> redaction per row
    val rows = graft.SparkEntry.queries("t_scrub")(spark, sfDir)
    assert(rows.filter($"clean").count() === 0L)
    assert(rows.filter(!$"redacted".contains("<NUM>")).count() === 0L)
    assert(rows.filter($"n_email" =!= 0L || $"n_ipv4" =!= 0L).count() === 0L)
  }
}
