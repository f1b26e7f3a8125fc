package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fault-injection proof that the engine's results are RETRY-
  * INVARIANT. On a 1000-executor cluster tasks fail and retry as a
  * matter of course (preemption, spot loss, fetch failures;
  * `spark.task.maxFailures` defaults to 4), so every correctness
  * claim implicitly claims "… even when any task's first attempt is
  * replayed". That holds only if each operator is deterministic per
  * partition and its aggregation states are merge-safe — the reason
  * the engine uses seeded/content-hash sampling (never rand()),
  * md5 tie-breaking priorities, and idempotent register-max HLL
  * merges. This spec makes the claim measured instead of analytic:
  * it re-emits a source scan through a stage whose partition-0 FIRST
  * attempt always throws (a JVM-wide counter proves the fault really
  * fired; accumulators would drop failed-task updates), lets Spark's
  * retry machinery replay it (test master is local[4,2]), and
  * asserts the results are bit-identical to the uninjected run for
  * representative shapes: a relational aggregate, the custom HLL
  * sketch aggregate, and two iterative vertex programs
  * (localCheckpoint lineage truncation under a faulting upstream).
  *
  * The engine MAINS deliberately stay at maxFailures=1 (local[N]):
  * in Verify/Bench a flaky task should fail loudly, not be healed —
  * this spec is where retry semantics are exercised on purpose.
  */
object TaskRetrySpec {
  /** Local-mode executors share the test JVM, so a static counter
    * observes fires from failed attempts reliably. */
  val fired = new AtomicInteger(0)
}

class TaskRetrySpec extends SparkSpec {
  import TaskRetrySpec.fired

  // fault injection is the whole point here
  override protected def allowsTaskFailures: Boolean = true

  /** Re-emit `df` through a stage whose partition-0 first attempt
    * always throws. Every downstream consumer sees the same rows —
    * after one Spark-internal retry of the failed task. */
  private def injected(df: DataFrame): DataFrame = {
    val rdd = df.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        fired.incrementAndGet()
        throw new RuntimeException("graft: injected first-attempt task failure")
      }
      it
    }
    spark.createDataFrame(rdd, df.schema)
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toIndexedSeq

  private def assertRetryInvariant(name: String)(pipe: DataFrame => DataFrame,
                                                 source: DataFrame): Unit = {
    val clean = rows(pipe(source))
    fired.set(0)
    val faulted = rows(pipe(injected(source)))
    assert(fired.get() >= 1, s"$name: the injected fault never fired — vacuous")
    assert(faulted === clean, s"$name: task retry changed the result")
    assert(clean.nonEmpty, s"$name: vacuous comparison (no rows)")
  }

  test("relational aggregate is retry-invariant") {
    import spark.implicits._
    assertRetryInvariant("pricing agg")(
      li => li.groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity").as("sum_qty"),
          sum($"l_extendedprice").as("sum_price"),
          count(lit(1)).as("cnt")),
      Tables.lineitem(spark, sfDir)
        .select($"l_returnflag", $"l_linestatus", $"l_quantity", $"l_extendedprice"))
  }

  test("HLL sketch aggregate is retry-invariant (register-max idempotence, est doubles compared)") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    assertRetryInvariant("hll per-group distinct")(
      keys => keys.groupBy($"g")
        .agg(graft.functions.GraftFunctions.hllMerge(
          graft.functions.GraftFunctions.hllUnit(xxhash64($"pk"))).as("regs"))
        .select($"g", graft.functions.GraftFunctions.hllCard($"regs").as("est")),
      Tables.lineitem(spark, sfDir)
        .select(($"l_orderkey" % 7).as("g"), $"l_partkey".cast("long").as("pk")))
  }

  test("ANF register propagation is retry-invariant under a faulting edge scan") {
    import spark.implicits._
    // the iterative vertex program: repartition + localCheckpoint of
    // the faulting source, then two join+merge rounds on top. The
    // binary regs column is pinned via md5 (Row.toString renders
    // arrays by identity, not content).
    assertRetryInvariant("Anf.run")(
      e => graph.Anf.run(spark, e, rounds = 2)
        .select($"node", md5($"regs").as("regs_md5"), $"est"),
      graph.GraphBuilder.partEdges(spark, sfDir))
  }

  test("Luby MIS is retry-invariant under a faulting edge scan (md5 priorities deterministic)") {
    import spark.implicits._
    val parts = Tables.part(spark, sfDir).select($"p_partkey".as("id"))
    assertRetryInvariant("Mis.run")(
      e => graph.Mis.run(spark, parts, e),
      graph.GraphBuilder.partEdgesWide(spark, sfDir))
  }

  test("streaming micro-batch task retry is seal-invariant (state-store abort + reload)") {
    import spark.implicits._
    // completes the fault matrix: StreamCrashRecoverySpec kills the
    // QUERY mid-batch (restart path); this kills a TASK inside the
    // micro-batch — the poison filter sits DOWNSTREAM of the
    // watermarked windowed agg, i.e. in the same stage as the
    // state-store commit, so the first attempt of every batch's
    // partition-0 state task dies after touching the store and the
    // retry must abort + reload the prior store version. The sealed
    // output must equal the uninjected replay's.
    val poison = udf { () =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        fired.incrementAndGet()
        throw new RuntimeException("graft: injected first-attempt task failure (streaming)")
      }
      true
    }.asNondeterministic()
    def run(inject: Boolean): Seq[String] = rows(
      streaming.StreamReplay.replay(spark, sfDir) { ds =>
        val agg = streaming.EventStreams.windowedCounts(ds.toDF())
        if (inject) agg.filter(poison()) else agg
      } { out => out.filter($"event_type" =!= streaming.StreamReplay.SENTINEL_TYPE) })
    val clean = run(inject = false)
    fired.set(0)
    val faulted = run(inject = true)
    assert(fired.get() >= 1, "the injected fault never fired — vacuous")
    assert(faulted === clean, "micro-batch task retry changed the sealed output")
    assert(clean.nonEmpty, "vacuous comparison (no sealed rows)")
  }
}
