package graft.table

import org.scalatest.funsuite.AnyFunSuite

class TableEnvSpec extends AnyFunSuite {
  private val env = new TableEnv(null)

  test("MATCH_RECOGNIZE SQL routes to the CEP compiler") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    Seq((1L, 1L, "view", java.sql.Timestamp.valueOf("2024-01-01 00:01:00")),
        (1L, 2L, "purchase", java.sql.Timestamp.valueOf("2024-01-01 00:02:00")),
        (2L, 3L, "view", java.sql.Timestamp.valueOf("2024-01-01 00:03:00")))
      .toDF("user_id", "event_id", "event_type", "ts")
      .createOrReplaceTempView("mr_events")
    val out = new TableEnv(spark).sqlQuery(
      """SELECT * FROM mr_events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY ts, event_id
        |  MEASURES A.event_id AS view_id, B.event_id AS purchase_id
        |  PATTERN (A B)
        |  DEFINE A AS A.event_type = 'view', B AS B.event_type = 'purchase'
        |) ORDER BY view_id""".stripMargin)
    assert(out.collect().map(r => (r.getLong(1), r.getLong(2))).toList
      == List((1L, 2L)))
  }

  test("TUMBLE rewrites to window()") {
    assert(env.rewrite("GROUP BY TUMBLE(ts, INTERVAL '6' HOUR), k")
      == "GROUP BY window(ts, '6 HOUR'), k")
  }

  test("HOP swaps slide/size into window()") {
    assert(env.rewrite("HOP(ts, INTERVAL '2' HOUR, INTERVAL '6' HOUR)")
      == "window(ts, '6 HOUR', '2 HOUR')")
  }

  test("SESSION rewrites to session_window()") {
    assert(env.rewrite("SESSION(ts, INTERVAL '30' MINUTE)")
      == "session_window(ts, '30 MINUTE')")
  }

  test("auxiliary start/end functions map to the window struct") {
    assert(env.rewrite("SELECT TUMBLE_START(ts, INTERVAL '6' HOUR) AS s")
      == "SELECT window.start AS s")
    assert(env.rewrite("SESSION_END(ts, INTERVAL '5' MINUTE)")
      == "session_window.end")
  }

  test("non-window SQL passes through untouched") {
    val sql = "SELECT a, count(*) FROM t GROUP BY a"
    assert(env.rewrite(sql) == sql)
  }
}
