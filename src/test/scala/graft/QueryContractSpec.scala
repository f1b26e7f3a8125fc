package graft

/** The driver contract: unique keys, oracles only for declared
  * queries, and every single query runs end-to-end at sf0.001. */
class QueryContractSpec extends SparkSpec {

  test("query keys are unique and oracle keys are a subset") {
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(qs.nonEmpty)
    assert(os.keySet.subsetOf(qs.keySet),
      s"oracle-only keys: ${os.keySet.diff(qs.keySet).mkString(", ")}")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
