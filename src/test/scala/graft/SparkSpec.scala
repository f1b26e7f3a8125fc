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

  /** EVERY task-end event, not just failures — the quiesce signal.
    * The failure counter alone can't detect a drained bus (a healthy
    * suite never moves it), so bus-drain is detected the TestMetrics
    * way: the total event count holding still. */
  private val taskEndEvents = new AtomicLong(0)
  @volatile private var installedOn: SparkSession = null

  private[graft] def installFailureCounter(s: SparkSession): Unit = synchronized {
    if (installedOn ne s) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          taskEndEvents.incrementAndGet()
          t.reason match {
            // exactly the reasons that consume a maxFailures retry —
            // TaskKilled (job cancellation racing in-flight tasks) and
            // Resubmitted are normal operation, not healed failures
            case f: org.apache.spark.TaskFailedReason if f.countTowardsTaskFailures =>
              failedTaskAttempts.incrementAndGet()
            case _ =>
          }
        }
      })
      installedOn = s
    }
  }

  /** Wait until the listener bus has drained its task-end backlog:
    * the event counter stable for `stableMs` (deadline-capped) — the
    * TestMetrics quiesce discipline. Replaces the fixed sleeps whose
    * late-landing TaskEnd could fail an innocent suite or leak an
    * expected failure into the next suite's baseline. */
  private[graft] def quiesceTaskEnds(stableMs: Long, deadlineMs: Long): Unit = {
    var last = -1L
    var stableSince = System.nanoTime()
    val deadline = System.nanoTime() + deadlineMs * 1000000L
    while (System.nanoTime() < deadline &&
           (System.nanoTime() - stableSince) < stableMs * 1000000L) {
      val now = taskEndEvents.get()
      if (now != last) { last = now; stableSince = System.nanoTime() }
      Thread.sleep(10)
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
    // let the block's failure events land: bus-drain quiesce, not a
    // fixed sleep (a late TaskEnd must fold into THIS baseline)
    SparkSpec.quiesceTaskEnds(stableMs = 150, deadlineMs = 5000)
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
    // Drain straggling task-end events into THIS suite's window, not
    // the next suite's baseline: quiesce on the event counter (tests
    // end on blocking actions, so the bus drains in ~one stability
    // window; the deadline caps a pathological backlog).
    SparkSpec.quiesceTaskEnds(stableMs = 100, deadlineMs = 2000)
    val delta = SparkSpec.failedTaskAttempts.get() - failuresAtStart
    if (!allowsTaskFailures && delta != 0)
      fail(s"$delta task attempt(s) failed and were silently retried during this suite " +
        "(master is local[4,2] for the fault-injection specs; a healthy suite must not " +
        "lean on retries — override allowsTaskFailures if failures are intended)")
    super.afterAll()
  }
}
