package graft.core

import graft.SparkSpec

/** §3.3: the Metabase-facing "everything is SELECT-able" surface — after
  * registerAll, plain ANSI SQL over every table works through Catalyst. */
class SqlSurfaceSpec extends SparkSpec {

  test("registerAll exposes every testdata table to spark.sql") {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    Tables.names.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) > 0,
        s"table $t empty or unregistered")
    }
    // a representative analyst query: star join + aggregate + having
    val df = spark.sql("""
      SELECT n_name, count(DISTINCT c_custkey) AS n_cust,
             sum(o_totalprice) AS total
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name HAVING count(*) > 5
      ORDER BY total DESC""")
    assert(df.count() > 0)
    assert(df.columns.toSeq == Seq("n_name", "n_cust", "total"))
  }
}
