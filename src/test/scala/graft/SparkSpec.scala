package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite JVM — suites run in
  * a forked JVM per build.sbt, so getOrCreate dedups across suites). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    // local[cores, maxFailures]: maxFailures=2 gives every task ONE
    // retry, the knob TaskRetrySpec's fault injection needs (a real
    // cluster defaults to 4). Engine mains keep local[N] (=1): in
    // Verify/Bench a flaky task should fail LOUDLY, not be healed.
    .master("local[4,2]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  override protected def afterAll(): Unit = {
    // Session is shared across suites; don't stop it here.
    super.afterAll()
  }
}
