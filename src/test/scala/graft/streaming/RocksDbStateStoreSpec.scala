package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB state backend (round-8 hardening): every e_stream key
  * is verified on the default HDFS-backed in-memory state store,
  * but a 1000-executor deployment with large keyed state runs the
  * RocksDB provider (state spills to local disk + changelog files,
  * memory stays bounded — the production configuration for exactly
  * the watermarked windows/sessions/joins this engine ships). This
  * spec replays representative STATEFUL pipelines — a watermarked
  * windowed aggregation, stateful sessionization
  * (flatMapGroupsWithState), and the two-store stream-stream
  * attribution join — through the SAME StreamReplay harness with
  * `spark.sql.streaming.stateStore.providerClass` flipped to
  * RocksDB, and asserts the sealed output row sets EQUAL the default
  * provider's (which the DuckDB oracle already pins to the batch
  * twins). State-store choice must be a pure deployment knob, never
  * a semantics change.
  */
class RocksDbStateStoreSpec extends SparkSpec {

  private val ROCKS =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val KEY = "spark.sql.streaming.stateStore.providerClass"

  private def withProvider[T](provider: Option[String])(body: => T): T = {
    val prior = spark.conf.getOption(KEY)
    provider match {
      case Some(p) => spark.conf.set(KEY, p)
      case None => spark.conf.unset(KEY)
    }
    try body
    finally prior match {
      case Some(p) => spark.conf.set(KEY, p)
      case None => spark.conf.unset(KEY)
    }
  }

  // sorted sequence, not a Set: a provider bug that duplicates or
  // drops one of two identical output rows (replayed uncommitted
  // batch) must fail the comparison, so multiplicity counts
  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toIndexedSeq

  private def replayBoth(name: String)(
      pipe: => org.apache.spark.sql.DataFrame): Unit = {
    val default = withProvider(None)(rows(pipe))
    val rocks = withProvider(Some(ROCKS))(rows(pipe))
    assert(rocks === default,
      s"$name: RocksDB state store changed the sealed output " +
        s"(default ${default.size} rows, rocksdb ${rocks.size} rows)")
    assert(default.nonEmpty, s"$name: vacuous comparison (no sealed rows)")
  }

  test("windowed aggregation seals identically on the RocksDB state store") {
    // through the registry like the other two tests, so the parity
    // guarantee tracks the SHIPPED key if its pipeline changes
    replayBoth("e_stream_window") {
      graft.SparkEntry.queries("e_stream_window")(spark, sfDir)
    }
  }

  test("stateful sessionization (flatMapGroupsWithState) seals identically on RocksDB") {
    import spark.implicits._
    replayBoth("e_stream_sessions") {
      graft.SparkEntry.queries("e_stream_sessions")(spark, sfDir)
    }
  }

  test("stream-stream attribution join (two state stores) seals identically on RocksDB") {
    import spark.implicits._
    replayBoth("e_stream_attrib") {
      graft.SparkEntry.queries("e_stream_attrib")(spark, sfDir)
    }
  }
}
