package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

/** Streaming ingest edge — the continuous twin of [[graft.sources.Ingest]]:
  * a corpus that lands as files (JSONL drops from a crawler, log
  * shippers) becomes an incremental DataFrame, and the parquet file
  * sink's transaction log plus the source checkpoint give END-TO-END
  * EXACTLY-ONCE for replayable file sources — a restart resumes from
  * the checkpoint without re-emitting rows already committed.
  *
  * Same edge contract as the batch readers: schema-explicit (never
  * inference — on a stream, inference would sample whatever files
  * happen to exist first). `maxFilesPerTrigger` bounds each
  * micro-batch: at warehouse scale an unbounded listing of a hot
  * landing prefix would make the first batch arbitrarily large.
  */
object StreamingIngest {

  /** Schema-explicit JSONL directory stream. */
  def jsonl(s: SparkSession, dir: String, schema: StructType,
            maxFilesPerTrigger: Int = 1000): DataFrame =
    s.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(dir)

  /** Exactly-once append to a parquet table (file-sink transaction
    * log + checkpoint). The returned query runs until stopped. */
  def toParquet(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** The hard-signal harness for the file-ingest edge (the
    * `e_stream_ingest` gate): lands the events table as JSONL files
    * in TWO waves with a full query stop/restart between them, runs
    * the checkpointed parquet-sink pipeline over each wave, and
    * returns the sink table for a row-set hash-compare against the
    * batch events SQL. What the compare proves:
    *
    *   - the schema-explicit JSONL source reads every landed file
    *     (any missed/partial file = missing rows);
    *   - END-TO-END EXACTLY-ONCE ACROSS A RESTART: the restarted
    *     query resumes from the source checkpoint (wave-A files are
    *     in the seen-file log, so they are not re-read) and the file
    *     sink's transaction log refuses replayed commits — a
    *     duplicated or dropped batch flips the row count/hash red;
    *   - value fidelity through the text encoding (doubles round-trip
    *     Jackson's shortest-representation printing bit-exactly; the
    *     event time ships as exact epoch micros, sidestepping
    *     streaming-side timestamp parsing).
    *
    * The result is materialized (localCheckpoint) before the temp
    * landing/sink/checkpoint dirs are deleted, so the returned plan
    * never dangles on removed files. */
  def replayFileIngest(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ingest_")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val ev = graft.Tables.events(s, sfDir).select(
      $"event_id".cast("long"), unix_micros($"ts").as("ts_us"),
      $"user_id".cast("long"), $"event_type", $"value".cast("double"))
    def runToCompletion(): Unit = {
      val q = toParquet(jsonl(s, landing, schema, maxFilesPerTrigger = 2), sink, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    try {
      // wave A: half the rows (3 files → 2 micro-batches), run, STOP
      ev.filter(pmod($"event_id", lit(2)) === 0)
        .repartition(3).write.mode("overwrite").json(landing)
      runToCompletion()
      // wave B lands while no query is running; the RESTARTED query
      // must pick up exactly the new files and nothing twice
      ev.filter(pmod($"event_id", lit(2)) === 1)
        .repartition(3).write.mode("append").json(landing)
      runToCompletion()
      s.read.schema(schema).parquet(sink)
        .select($"event_id", $"ts_us", $"user_id", $"event_type",
          round($"value".cast("decimal(18,2)"), 2).cast("double").as("value"))
        .localCheckpoint()
    } finally {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      val walk = Files.walk(base)
      try walk.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally walk.close()
    }
  }
}
