package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only streaming-key profiler (guide §1: measure first): runs the
  * named replay-backed keys with MicroBatchExecution progress logging
  * raised to INFO so each micro-batch's durationMs breakdown
  * (addBatch / getBatch / queryPlanning / walCommit / commitOffsets /
  * stateStore metrics) lands on stderr, then prints the wall time.
  * Not part of the driver contract. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("e_stream_outer")
    val spark = GraftSession.local(defaultCpus = "32")
    spark.sparkContext.setLogLevel("WARN")
    // after setLogLevel: raise just the progress logger back to INFO
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming",
      org.apache.logging.log4j.Level.INFO)
    // warmup (codegen + replay staging) outside the timed region
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    graft.streaming.StreamReplay.prepare(spark, sfDir)
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "1").toInt
    names.foreach { n =>
      (1 to reps).foreach { r =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"PROBE $n%-20s rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
