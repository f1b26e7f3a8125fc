package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev-only single-query timer (not part of the driver contract):
  * `runMain graft.tools.TimeQuery <sfDir> <query>...` — one warmup at
  * sf0.001, then a timed noop-materialized run per query, mirroring
  * [[graft.Bench]]'s methodology. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(defaultCpus = "32")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val q = SparkEntry.queries(name)
      q(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"TIME $name%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
      System.gc() // Bench parity: let the ContextCleaner reclaim checkpoint blocks
    }
    spark.stop()
  }
}
