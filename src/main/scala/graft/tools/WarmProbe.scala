package graft.tools

import graft.{GraftSession, SparkEntry}
import scala.util.control.NonFatal

/** Dev-only reproducer for the full-suite context inflation (guide
  * §1): replicates Bench's warmup — EVERY query once at sf0.001 —
  * then times just the named keys at the bench SF with Bench's
  * cooldown, so a key that only slows down after the whole suite has
  * been warmed can be isolated without a 20-minute full run. */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val names = args.toSeq
    val spark = GraftSession.local(defaultCpus = "32")
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming",
      org.apache.logging.log4j.Level.INFO)
    def cooldown(): Unit = { spark.catalog.clearCache(); System.gc() }
    val warm0 = System.nanoTime()
    SparkEntry.queries.keys.toSeq.sorted.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case NonFatal(_) => () }
      cooldown()
    }
    println(f"WARMUP ${(System.nanoTime() - warm0) / 1e9}%.1f s")
    try graft.streaming.StreamReplay.prepare(spark, sfDir)
    catch { case NonFatal(e) => System.err.println(s"prestage: ${e.getMessage}") }
    val rt = Runtime.getRuntime
    names.foreach { n =>
      (1 to reps).foreach { r =>
        val heap0 = (rt.totalMemory - rt.freeMemory) / 1e9
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        val heap1 = (rt.totalMemory - rt.freeMemory) / 1e9
        println(f"WARMPROBE $n%-20s rep$r $t%.2f s heap $heap0%.1f->$heap1%.1f GB")
        cooldown()
      }
    }
    spark.stop()
  }
}
