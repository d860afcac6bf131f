package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capability queries live in topic modules under graft.operators /
  * graft.functions / graft.streaming / graft.pipeline and are assembled
  * by [[Registry]]; this object just exposes the driver's shape.
  */
object SparkEntry {

  /** Flagship query (TPC-H Q3 analog, 3-way join + agg + top-k) on
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.all.find(_.name == "q02_shipping_priority").get
      .fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(d => d.name -> d.fn).toMap

  /** DuckDB-equivalent SQL per query (column names match exactly).
    * Queries without an entry get the driver's rows-only check. */
  def oracleSql: Map[String, String] =
    Registry.all.collect { case QueryDef(n, Some(sql), _) => n -> sql }.toMap
}
