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

  def sqlQuery(sql: String): DataFrame = sql match {
    // MATCH_RECOGNIZE routes to the CEP compiler (the reference plans
    // it as DataStreamMatch over the NFA runtime, DataStreamMatch
    // .scala:65 — Spark's parser has no such clause, so the supported
    // form is `SELECT * FROM <table> MATCH_RECOGNIZE (...)` with an
    // optional trailing ORDER BY)
    case TableEnv.MatchRecognizeSql(table, clause, order) =>
      val matched = graft.cep.MatchRecognize(spark.table(table), clause)
      if (order == null) matched
      else {
        matched.createOrReplaceTempView("__graft_mr")
        spark.sql(s"SELECT * FROM __graft_mr $order")
      }
    case _ => spark.sql(rewrite(sql))
  }

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

  /** `SELECT * FROM t MATCH_RECOGNIZE ( ... ) [ORDER BY ...]` — the
    * clause body is everything between the outermost parentheses. */
  private[table] val MatchRecognizeSql =
    """(?is)\s*SELECT\s+\*\s+FROM\s+([\w.]+)\s+MATCH_RECOGNIZE\s*\((.*)\)\s*(ORDER\s+BY\s+[\w\s,.]+)?\s*""".r
}
