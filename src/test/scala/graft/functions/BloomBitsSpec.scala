package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomBitsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 1 << 14
  private val K = 5

  test("no false negatives: every inserted member probes true") {
    val members = (0 until 2000).map(i => s"member_$i").toDF("v")
    val bits = BloomBits.build(members, $"v", M, K)
    val misses = members
      .filter(!BloomBits.mightContain(bits, $"v", M, K)).count()
    assert(misses === 0)
  }

  test("false-positive rate on disjoint probes stays near the published bound") {
    val members = (0 until 2000).map(i => s"member_$i").toDF("v")
    val bits = BloomBits.build(members, $"v", M, K)
    val probes = (0 until 10000).map(i => s"absent_$i").toDF("v")
    val fp = probes.filter(BloomBits.mightContain(bits, $"v", M, K)).count()
    // kn/m ≈ 0.61 → theoretical FP ≈ (1−e^−0.61)^5 ≈ 2.6%; allow 3×
    assert(fp.toDouble / 10000 < 0.08, s"fp rate ${fp / 10000.0}")
  }

  test("filter size is capped by m, not by member cardinality") {
    val small = (0 until 10).map(i => s"s_$i").toDF("v")
    val large = (0 until 50000).map(i => s"l_$i").toDF("v")
    assert(BloomBits.build(small, $"v", M, K).length === M / 64)
    assert(BloomBits.build(large, $"v", M, K).length === M / 64)
  }

  test("build rejects a non-power-of-two m") {
    intercept[IllegalArgumentException] {
      BloomBits.build(Seq("x").toDF("v"), $"v", 1000, K)
    }
  }

  test("probe plan stays join-free and whole-stage-codegen'd") {
    val members = (0 until 100).map(i => s"member_$i").toDF("v")
    val bits = BloomBits.build(members, $"v", M, K)
    // probe over a range leaf — a local Seq would be constant-folded
    // into an (empty) LocalTableScan before any codegen happens
    val plan = spark.range(100).select(concat(lit("p_"), $"id").as("v"))
      .filter(BloomBits.mightContain(bits, $"v", M, K))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // `*(n)` is executedPlan.toString's marker for a WholeStageCodegen span
    assert(plan.contains("*(1) Filter"), plan.take(400))
  }
}
