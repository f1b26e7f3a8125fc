package graft

/** The plain-SQL driving surface: registered views + injected
  * functions make `spark.sql(...)` a first-class way to use the
  * engine (the reference's users speak SQLite SQL). */
class SqlSurfaceSpec extends SparkSpec {

  test("registerViews exposes every test table to spark.sql") {
    Tables.registerViews(spark, sfDir)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() === 1, n)
    }
  }

  test("a multi-table SQL query over the views runs end-to-end") {
    Tables.registerViews(spark, sfDir)
    val top = spark.sql(
      """SELECT n.n_name, count(*) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n_orders DESC, n_name LIMIT 5""".stripMargin)
      .collect()
    assert(top.nonEmpty && top.forall(_.getLong(1) > 0))
  }

  test("registered graft functions are callable from SQL") {
    Tables.registerViews(spark, sfDir)
    val r = spark.sql(
      "SELECT graft_hamming('1010', '1001') AS h").collect().head.getLong(0)
    assert(r === 2L)
  }
}
