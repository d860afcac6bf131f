package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import graft.api.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scale-technique demonstrations whose results are oracle-checked:
  * salted skew join, exact percentiles, and bucketed co-located join
  * (§2.9 physical distribution + BASELINE scale north-star).
  */
object ScaleQueries extends QueryModule {

  override def queries: Seq[QueryDef] = Seq(

    // ----- salted join: same result as the plain join, hot keys
    // spread across 8 salt buckets -----
    q("q77_salted_join",
      """SELECT n_name, count(*) AS n,
        |  CAST(sum(CAST(value AS decimal(18,4))) AS decimal(38,4)) AS sum_value
        |FROM events JOIN nation ON CAST(user_id % 25 AS INTEGER) = n_nationkey
        |GROUP BY n_name ORDER BY n_name""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .withColumn("nk", (col("user_id") % 25).cast("int"))
      val joined = Skew.saltedJoin(ev, Tables.t(s, dir, "nation"),
        col("nk"), col("n_nationkey"), col("event_id"), salts = 8)
      joined.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(38, 4)).as("sum_value"))
        .orderBy(col("n_name"))
    },

    // ----- exact percentiles (continuous interpolation both engines) -----
    q("q78_percentiles",
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.5), 6) AS med,
        |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 6) AS p99
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      Tables.t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("med"),
          round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 6).as("p99"))
        .orderBy(col("o_orderstatus"))
    },

    // ----- bucketed co-located join: both sides bucketed by the join
    // key into the session catalog → the join runs with NO shuffle
    // exchange (the batch analog of Flink's pre-partitioned ship
    // strategy; at 100 TB this is how repeated joins amortize their
    // shuffle) -----
    q("q79_bucketed_join",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS decimal(18,4))) AS decimal(38,4)) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""") { (s, dir) =>
      val base = "/root/repo/target/bucketed"
      s.sql("DROP TABLE IF EXISTS g_li_bucketed")
      s.sql("DROP TABLE IF EXISTS g_ord_bucketed")
      Tables.t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").option("path", s"$base/li")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("g_li_bucketed")
      Tables.t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus"))
        .write.mode("overwrite").option("path", s"$base/ord")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("g_ord_bucketed")
      s.table("g_li_bucketed")
        .join(s.table("g_ord_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DecimalType(38, 4)).as("sum_qty"))
        .orderBy(col("o_orderstatus"))
    }
  )
}
