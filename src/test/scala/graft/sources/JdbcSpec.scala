package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** JDBC source/sink against embedded Derby — the same engine the
  * reference's JDBCTestBase.java:38 uses, so the path runs end-to-end
  * in this sandbox (in-JVM database, no server). */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftspec;create=true"
  private def props = {
    val p = new java.util.Properties
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("JDBC write + ranged parallel read round-trips nation") {
    val n = graft.Tables.t(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    Jdbc.write(n, url, "nation_spec", SaveMode.Overwrite, props)
    val back = Jdbc.readPartitioned(spark, url, "nation_spec",
      "n_nationkey", 0L, 24L, numPartitions = 4, props = props)
    // the ranged read really is a 4-way parallel scan
    assert(back.rdd.getNumPartitions == 4)
    val a = n.collect().map(_.toSeq).toSet
    val b = back.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .collect().map(_.toSeq).toSet
    assert(a == b, "JDBC round-trip must be identity")
    // splits cover everything: no row lost at the range edges
    assert(back.count() == n.count())
  }

  test("filters push into the remote JDBC query") {
    val filtered = Jdbc.read(spark, url, "nation_spec", props)
      .filter(col("n_regionkey") === 1)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("n_regionkey"),
      s"expected the predicate pushed into the JDBC scan, plan:\n$plan")
    assert(filtered.count() ==
      graft.Tables.t(spark, sf, "nation").filter(col("n_regionkey") === 1).count())
  }
}
