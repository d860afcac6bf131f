package graft.table

import org.scalatest.funsuite.AnyFunSuite

class TableEnvSpec extends AnyFunSuite {
  private val env = new TableEnv(null)

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
