package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session defaults — the knobs that change
  * between local[32] testing and a 1000-executor cluster are all
  * here, documented, instead of scattered across mains.
  *
  * Scale guidance (SURVEY §5):
  *  - `shufflePartitions`: = total cores locally; on a cluster start
  *    at 2–3× total executor cores and let AQE coalesce down. With
  *    AQE enabled this is a ceiling, not a constant.
  *  - AQE stays ON (Spark 4 default): runtime broadcast promotion,
  *    partition coalescing and skew-join splitting are exactly the
  *    degrees of freedom a 100 TB plan needs — the engine's plans
  *    deliberately avoid forced broadcasts of SF-scaled tables so AQE
  *    can decide per run.
  *  - `spark.sql.session.timeZone=UTC` is part of the oracle-parity
  *    determinism contract (timestamp literals must not depend on
  *    host timezone).
  *  - Native functions (graft_dot_quant, graft_hamming, graft_top_k,
  *    graft_heavy_hitters) are injected via
  *    [[graft.functions.GraftExtensions]]; packs also register them
  *    imperatively so driver-provided sessions work too.
  */
object GraftSession {

  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the events table stores TIMESTAMP(NANOS) (see Tables.events);
      // declared up front rather than flipped mid-session
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // LOCAL-deployment streaming-checkpoint I/O (round 15): without
      // the native hadoop library, Hadoop's local FS forks a `chmod`
      // process per created checkpoint file — dozens per stateful
      // micro-batch, intermittently stalling whole batches (driver
      // thread dumps caught micro-batch threads in forkAndExec; the
      // 2-4x streaming-key inflation in full-suite benches). The NIO
      // manager does the same create/rename/read as direct syscalls.
      // Cluster deployments checkpointing to HDFS/S3 build their own
      // session and keep Spark's default manager. The Spark 4.1
      // checksum sidecar (corruption detection for REMOTE checkpoint
      // stores) is off for the same reason: it doubles local file
      // creates to protect tmpfs scratch that is rebuilt on restart.
      .config("spark.sql.streaming.checkpointFileManagerClass",
        "graft.util.NioCheckpointFileManager")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      // same fork, batch half: every local file CREATE (parquet part
      // files, crc sidecars, _SUCCESS, staged chunks) applies its
      // permission through RawLocalFileSystem.setPermission = a
      // forked `chmod` without the native lib. Same bits, via NIO.
      .config("spark.hadoop.fs.file.impl", "graft.util.NioLocalFileSystem")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)

  /** The driver-facing local session: cores from SPARK_GRAFT_CPUS. */
  def local(defaultCpus: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val s = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
