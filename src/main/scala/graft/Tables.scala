package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single entry point for the driver-generated test tables
  * (TPC-H-ish star schema + events/documents/embeddings; see
  * /root/repo/TESTDATA.md). Keeping all reads here means schema
  * assumptions live in one place and every query benefits from
  * parquet column pruning + predicate pushdown automatically.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** The events parquet stores TIMESTAMP(NANOS), which Spark rejects
    * by default; read the raw nanos as long and floor to microseconds
    * — the same conversion DuckDB applies (verified: epoch_us
    * truncates), so oracle parity holds. Epochs are positive, so
    * `div 1000` (truncate toward zero) equals floor.
    *
    * The legacy flag is a SESSION-WIDE setting and it must stay set
    * for as long as plans reading this table may execute (the parquet
    * reader consults it at execution, not just at schema inference),
    * so it cannot be set-and-restored here. GraftSession declares it
    * up front for engine-built sessions; this set covers
    * driver-provided sessions and is deliberately idempotent. The
    * visible effect on OTHER tables: a TIMESTAMP(NANOS) column reads
    * as raw long instead of failing. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    // the generator has shipped ts as TIMESTAMP(NANOS) (reads as raw
    // long under the legacy flag) and as TIMESTAMP(MICROS)/NTZ —
    // normalize either encoding to a session-TZ TIMESTAMP in exact
    // microseconds. GraftSession pins the session TZ to UTC, so the
    // NTZ cast is a type relabel, not a wall-clock shift — identical
    // to DuckDB reading the same column.
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fan a small-file scan out to the session's parallelism before a
    * CPU-bound map stage (signature hashing, winnowing). A few-MB
    * parquet arrives as ONE input split, which would serialize such a
    * stage on a single core; at warehouse scale the file count makes
    * this shuffle a no-op-sized rebalance, locally it is the
    * difference between 1 core and all of them. */
  def fanOut(s: SparkSession, df: DataFrame): DataFrame =
    df.repartition(s.sparkContext.defaultParallelism)

  /** All table names with a loader. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a temp view so users can drive the
    * engine with plain `spark.sql(...)` — the relational surface the
    * reference exposes through SQLite. Custom functions
    * (graft_dot_quant, graft_hamming, graft_top_k) ride along. */
  def registerViews(s: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.register(s)
    names.foreach { n =>
      val df = n match {
        case "events" => events(s, sfDir)
        case other    => load(s, sfDir, other)
      }
      df.createOrReplaceTempView(n)
    }
  }
}

/** A named group of driver-checkable queries: the Spark definition and
  * the equivalent DuckDB oracle SQL side by side so column aliases
  * stay in sync (the driver hash-compares by sorted column name).
  * Oracle-less entries (non-SQL-expressible ops) get a rows-only check.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Keys driven through the chunked streaming-replay harness
    * ([[graft.streaming.StreamReplay]] or a sibling file-feed): their
    * first run against a scale dir pays a one-time sort+stage job, and
    * their timings carry the shared per-micro-batch harness cost.
    * [[graft.Bench]] consumes this to pre-stage before its timed
    * region and to report per-key operator share vs the harness floor
    * — a registry, not a key-name-prefix convention, so a future
    * replay-backed key can be named anything. */
  def replayBackedKeys: Set[String] = Set.empty
}
