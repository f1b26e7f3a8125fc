package graft.graph

import graft.SparkSpec
import graft.functions.{GraftFunctions, Hll}
import org.apache.spark.sql.functions._

class AnfSpec extends SparkSpec {
  import spark.implicits._

  private def pathEdges(n: Int) = {
    val up = (1 until n).map(i => (i.toLong, (i + 1).toLong))
    (up ++ up.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  test("hand-computed path graph: 2-ball estimates track exact sizes") {
    // path 1-2-3-4-5: exact |ball(v,2)| = 3,4,5,4,3
    val exact = Map(1L -> 3.0, 2L -> 4.0, 3L -> 5.0, 4L -> 4.0, 5L -> 3.0)
    val out = Anf.run(spark, pathEdges(5), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.keySet === exact.keySet)
    // tiny cardinalities in the linear-counting regime: tight bound
    exact.foreach { case (v, n) =>
      assert(math.abs(out(v) - n) / n <= 0.25, s"node $v: est ${out(v)} vs exact $n")
    }
  }

  test("rounds=0 estimates ~1 for every node; estimates grow with rounds") {
    val e = pathEdges(30)
    val r0 = Anf.run(spark, e, 0).collect().map(_.getDouble(2))
    assert(r0.forall(est => math.abs(est - 1.0) < 0.05))
    val r1 = Anf.run(spark, e, 1).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val r3 = Anf.run(spark, e, 3).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // monotone: a larger ball never estimates meaningfully smaller
    r1.keys.foreach(v => assert(r3(v) >= r1(v) - 1e-9))
  }

  test("register merge is idempotent and order-free: duplicate edges change nothing") {
    val e = pathEdges(8)
    val dup = e.union(e).union(e) // re-sent messages
    val a = Anf.run(spark, e, 2).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = Anf.run(spark, dup, 2).collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b)
  }

  test("estimate is a pure function of registers (Hll.estimate on unit counter ≈ 1)") {
    val regs = new Array[Byte](Hll.M)
    regs(7) = 3
    val est = Hll.estimate(regs)
    assert(est > 0.5 && est < 1.5, s"unit estimate $est")
  }

  test("sf0.001 part graph: worst-node relative error well inside the 0.4 pack bound") {
    GraftFunctions.register(spark)
    val e = GraphBuilder.partEdges(spark, sfDir).localCheckpoint(false)
    val est = Anf.run(spark, e, 2)
    val ball = e.select($"src", $"dst".as("member"))
      .union(e.select($"src", $"dst".as("mid"))
        .join(e.select($"src".as("mid"), $"dst".as("far")), "mid")
        .select($"src", $"far".as("member")))
      .union(e.select($"src", $"src".as("member")))
      .distinct()
      .groupBy($"src".as("node")).agg(count(lit(1)).as("ball2"))
    val worst = est.join(ball, "node")
      .select((abs($"est" - $"ball2".cast("double")) / $"ball2".cast("double")).as("rel"))
      .agg(max($"rel")).collect()(0).getDouble(0)
    assert(worst <= 0.25, s"worst relative error $worst")
  }
}
