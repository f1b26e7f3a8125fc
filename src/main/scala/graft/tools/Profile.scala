package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Signatures
import graft.text.TextOps

/** Dev-only stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $name%-20s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    Tables.documents(spark, d).count()

    val sets = Tables.fanOut(spark, Tables.documents(spark, d))
      .select($"doc_id", Signatures.shingleSet(TextOps.words($"text")).as("set"))
      .filter(size($"set") > 0).persist()
    time("sets.count")(sets.count())
    val sh = sets.select($"doc_id", explode($"set").as("shingle"))
    time("sh.count")(sh.count())
    val buckets = sh.groupBy($"shingle").agg(collect_list($"doc_id").as("ds"))
      .filter(size($"ds").between(2, 20))
    time("buckets.count")(buckets.count())
    val pairsUdf = udf { ds: Seq[Long] =>
      val a = ds.toArray.sorted
      val out = Seq.newBuilder[(Long, Long)]
      var i = 0
      while (i < a.length) { var j = i + 1; while (j < a.length) { if (a(i) != a(j)) out += ((a(i), a(j))); j += 1 }; i += 1 }
      out.result()
    }
    val cand = buckets.select(explode(pairsUdf($"ds")).as("p"))
      .groupBy($"p._1".as("da"), $"p._2".as("db"))
      .agg(count(lit(1)).as("n_common")).filter($"n_common" >= 2).select($"da", $"db")
    time("cand.count")(cand.count())
    val withSets = cand
      .join(sets.select($"doc_id".as("da"), $"set".as("seta")), "da")
      .join(sets.select($"doc_id".as("db"), $"set".as("setb")), "db")
    time("withSets.count")(withSets.count())
    val inter = udf { (a: Seq[String], b: Seq[String]) =>
      var i = 0; var j = 0; var n = 0L
      while (i < a.length && j < b.length) {
        val c = a(i).compareTo(b(j))
        if (c == 0) { n += 1; i += 1; j += 1 } else if (c < 0) i += 1 else j += 1
      }
      n
    }
    val fin = withSets.withColumn("i", inter($"seta", $"setb"))
      .withColumn("jaccard", $"i".cast("double") / (size($"seta") + size($"setb") - $"i").cast("double"))
      .filter($"jaccard" >= 0.5).select($"da".as("doc_a"), $"db".as("doc_b"), $"jaccard")
    time("final.noop")(fin.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
