package graft

import org.apache.spark.sql.functions._

/** Round-6 additions: the label-propagation dim-bounded fast path. */
class RoundSixOpsSpec extends SparkSpec {

  test("LabelPropagation: the dim-bounded fast path is bit-identical to the distributed loop") {
    // the guarded driver iteration (smallGraph) must replay the same
    // integer argmax with the (count DESC, label ASC) total order:
    // compare on the sf0.001 widened part edit-graph (the g_labelprop
    // input — multi-community, asymmetric degrees), every label
    import spark.implicits._
    val vertices = Tables.part(spark, sfDir).select($"p_partkey".cast("long").as("id"))
    val edges = graft.graph.GraphBuilder.partEdgesWide(spark, sfDir)
    def labels(small: Boolean) =
      graft.graph.LabelPropagation.run(spark, vertices, edges, iters = 4, smallGraph = small)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = labels(small = false)
    val fast = labels(small = true)
    assert(fast.keySet === dist.keySet)
    assert(fast.forall { case (n, l) => dist(n) == l },
      "fast-path labels must match the distributed loop exactly")
    // and the guard refuses a caller lying about boundedness
    val big = spark.range((1L << 20) + 2L).select(col("id").as("src"), lit(2L).as("dst"))
    intercept[IllegalArgumentException] {
      graft.graph.LabelPropagation.run(spark,
        Seq(1L).toDF("id"), big, iters = 1, smallGraph = true)
    }
  }

  test("g_dag_depth: the fact scan joins the class depths exactly once, broadcast") {
    // The quotient-graph promise: facts never iterate — the returned
    // plan over the part table must be a single BroadcastHashJoin
    // against the in-process class-depth table, nothing more. A
    // regression toward per-part relaxation (extra joins) or a
    // shuffled join of the tiny class table fails here.
    val plan = SparkEntry.queries("g_dag_depth")(spark, sfDir)
      .queryExecution.sparkPlan.toString
    val joins = plan.linesIterator.count(_.trim.contains("Join"))
    assert(joins === 1, s"expected exactly one join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"class-depth join must broadcast:\n$plan")
  }

  test("g_dag_depth: depths satisfy the longest-path recurrence on the class DAG") {
    // depth(v) = 0 with no same-brand part 1-2 sizes below, else
    // 1 + max(depth at size-1, depth at size-2) — checked directly
    // against the part table, independent of the oracle
    import spark.implicits._
    val p = Tables.part(spark, sfDir)
      .select($"p_partkey".cast("long").as("part"), $"p_brand".as("brand"),
        $"p_size".cast("int").as("size")).collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    val depth = SparkEntry.queries("g_dag_depth")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(depth.keySet === p.keySet)
    val repById = p.toSeq.groupBy(_._2).map { case (c, parts) => c -> parts.head._1 }
    val classDepth = repById.map { case (c, id) => c -> depth(id) }
    depth.foreach { case (id, d) =>
      val (b, sz) = p(id)
      val preds = Seq(sz - 1, sz - 2).filter(s2 => classDepth.contains((b, s2)))
      val want = if (preds.isEmpty) 0L else preds.map(s2 => classDepth((b, s2)) + 1L).max
      assert(d === want, s"part $id (brand $b size $sz)")
    }
  }
}
