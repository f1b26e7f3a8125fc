package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

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
}
