package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table/SQL façade (reference TableEnvironment.scala:740 sqlQuery,
  * :439 registerFunction) with a small dialect shim so Flink-style
  * group-window SQL runs unchanged:
  *
  *   TUMBLE(ts, INTERVAL '6' HOUR)            → window(ts, '6 hour')
  *   HOP(ts, INTERVAL '2' HOUR, INTERVAL '6' HOUR)
  *                                            → window(ts, '6 hour', '2 hour')
  *   SESSION(ts, INTERVAL '30' MINUTE)        → session_window(ts, '30 minute')
  *   TUMBLE_START, TUMBLE_END, HOP_x, SESSION_x → window.start etc.
  *
  * The rewrite is a pre-parse string transform (reference does the
  * same recognition as a Calcite rule, DataStreamLogicalWindowAggregate
  * Rule); everything else goes straight to spark.sql so Catalyst owns
  * parsing, optimization and execution.
  */
final class TableEnv(val spark: SparkSession) {

  def registerTable(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  def sqlQuery(sql: String): DataFrame = spark.sql(rewrite(sql))

  /** INSERT INTO (TableEnvironment.sqlUpdate — 1.8 has DML only). */
  def sqlUpdate(sql: String): Unit = spark.sql(rewrite(sql))

  private val interval = """INTERVAL\s+'(\d+)'\s+(\w+)"""

  private[table] def rewrite(sql: String): String = {
    var s = sql
    // group-window auxiliary functions first (longest match)
    s = s.replaceAll("""(?i)(TUMBLE|HOP)_START\s*\([^)]*\)""", "window.start")
    s = s.replaceAll("""(?i)(TUMBLE|HOP)_END\s*\([^)]*\)""", "window.end")
    s = s.replaceAll("""(?i)SESSION_START\s*\([^)]*\)""", "session_window.start")
    s = s.replaceAll("""(?i)SESSION_END\s*\([^)]*\)""", "session_window.end")
    // assigners
    s = s.replaceAll(s"""(?i)TUMBLE\\s*\\(\\s*([\\w.]+)\\s*,\\s*$interval\\s*\\)""",
      "window($1, '$2 $3')")
    s = s.replaceAll(
      s"""(?i)HOP\\s*\\(\\s*([\\w.]+)\\s*,\\s*$interval\\s*,\\s*$interval\\s*\\)""",
      "window($1, '$4 $5', '$2 $3')") // HOP(ts, slide, size) → window(ts, size, slide)
    s = s.replaceAll(s"""(?i)SESSION\\s*\\(\\s*([\\w.]+)\\s*,\\s*$interval\\s*\\)""",
      "session_window($1, '$2 $3')")
    s
  }
}

object TableEnv {
  def apply(spark: SparkSession): TableEnv = new TableEnv(spark)
}
