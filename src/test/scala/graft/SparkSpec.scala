package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

object SparkSpec {
  /** JVM-wide count of FAILED task attempts. The test master is
    * local[4,2] so fault-injection specs can exercise Spark's retry
    * machinery — but that also means a real intermittent task crash
    * anywhere else would be silently healed. This counter keeps every
    * other suite as loud as the old maxFailures=1 master: SparkSpec's
    * afterAll asserts no task attempt failed during the suite unless
    * the suite explicitly opts in (`allowsTaskFailures`). */
  val failedTaskAttempts = new AtomicLong(0)
  @volatile private var installedOn: SparkSession = null

  private[graft] def installFailureCounter(s: SparkSession): Unit = synchronized {
    if (installedOn ne s) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = t.reason match {
          // exactly the reasons that consume a maxFailures retry —
          // TaskKilled (job cancellation racing in-flight tasks) and
          // Resubmitted are normal operation, not healed failures
          case f: org.apache.spark.TaskFailedReason if f.countTowardsTaskFailures =>
            failedTaskAttempts.incrementAndGet()
          case _ =>
        }
      })
      installedOn = s
    }
  }
}

/** Shared local session for specs (one per suite JVM — suites run in
  * a forked JVM per build.sbt, so getOrCreate dedups across suites). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[cores, maxFailures]: maxFailures=2 gives every task ONE
      // retry, the knob the fault-injection specs need (a real
      // cluster defaults to 4). Engine mains keep local[N] (=1): in
      // Verify/Bench a flaky task should fail LOUDLY, not be healed.
      .master("local[4,2]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSpec.installFailureCounter(s)
    s
  }

  val sfDir = "/root/testdata/sf0.001"

  /** Suites whose EVERY test injects task faults (TaskRetrySpec,
    * StreamCrashRecoverySpec) override this to true; a suite with one
    * intentionally-failing block should instead wrap just that block
    * in [[expectTaskFailures]] so the rest of the suite stays loud. */
  protected def allowsTaskFailures: Boolean = false

  private var failuresAtStart = 0L

  /** Run a block whose task failures are EXPECTED (executor-side
    * domain guards asserted via intercept, FAILFAST malformed-row
    * reads) without widening the whole suite's allowance: the block's
    * observed failure delta is folded into the baseline. */
  protected def expectTaskFailures[T](body: => T): T = {
    val before = SparkSpec.failedTaskAttempts.get()
    val result = body
    Thread.sleep(200) // let the block's failure events land
    failuresAtStart += SparkSpec.failedTaskAttempts.get() - before
    result
  }

  override protected def beforeAll(): Unit = {
    spark // force session + listener install before counting
    failuresAtStart = SparkSpec.failedTaskAttempts.get()
    super.beforeAll()
  }

  override protected def afterAll(): Unit = {
    // Session is shared across suites; don't stop it here.
    // Brief grace so this suite's own straggling task-end events land
    // in THIS suite's window, not the next suite's baseline (tests
    // end on blocking actions, so listener lag is small; 50 ms × 57
    // suites is the whole cost).
    Thread.sleep(50)
    val delta = SparkSpec.failedTaskAttempts.get() - failuresAtStart
    if (!allowsTaskFailures && delta != 0)
      fail(s"$delta task attempt(s) failed and were silently retried during this suite " +
        "(master is local[4,2] for the fault-injection specs; a healthy suite must not " +
        "lean on retries — override allowsTaskFailures if failures are intended)")
    super.afterAll()
  }
}
