package graft.cep

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE subset semantics beyond q87/q132: aggregate
  * measures, star/range quantifiers, and null handling in COUNT. */
class MatchRecognizeSpec extends SparkSpec {
  import spark.implicits._

  // (k, seq, v, tag)
  private def df(rows: (Int, Int, java.lang.Double, String)*) =
    rows.toDF("k", "seq", "v", "tag")

  test("aggregate measures span every row the quantified symbol matched") {
    val out = MatchRecognize(
      df((1, 1, 10.0, "up"), (1, 2, 20.0, "up"), (1, 3, 5.0, "x"),
        (1, 4, 30.0, "up")),
      """PARTITION BY k
        |ORDER BY seq
        |MEASURES COUNT(UP.*) AS n, SUM(UP.v) AS s, AVG(UP.v) AS a,
        |         MIN(UP.v) AS lo, MAX(UP.v) AS hi,
        |         FIRST(UP.seq) AS f, LAST(UP.seq) AS l
        |PATTERN (UP+)
        |DEFINE UP AS UP.tag = 'up'""".stripMargin)
      .as[(Int, Long, Double, Double, Double, Double, Int, Int)]
      .collect().sortBy(_._7).toList
    // two maximal runs: rows 1-2 and row 4
    assert(out == List(
      (1, 2L, 30.0, 15.0, 10.0, 20.0, 1, 2),
      (1, 1L, 30.0, 30.0, 30.0, 30.0, 4, 4)))
  }

  test("star quantifier matches zero occurrences; {n,m} bounds the block") {
    val d = df((1, 1, 1.0, "a"), (1, 2, 2.0, "b"), (1, 3, 3.0, "b"),
      (1, 4, 4.0, "b"), (1, 5, 5.0, "c"))
    // B* with zero B rows between A and C still matches
    val star = MatchRecognize(
      df((1, 1, 1.0, "a"), (1, 2, 5.0, "c")),
      """PARTITION BY k
        |ORDER BY seq
        |MEASURES A.seq AS a_seq, COUNT(B.*) AS nb, C.seq AS c_seq
        |PATTERN (A B* C)
        |DEFINE A AS A.tag = 'a', B AS B.tag = 'b', C AS C.tag = 'c'"""
        .stripMargin).as[(Int, Int, Long, Int)].collect().toList
    assert(star == List((1, 1, 0L, 2)))
    // B{1,2}: greedy two of the three b-rows, then C must follow — no
    // match (c not adjacent); B{2,3} consumes all three and matches
    val ranged = MatchRecognize(d,
      """PARTITION BY k
        |ORDER BY seq
        |MEASURES COUNT(B.*) AS nb
        |PATTERN (A B{2,3} C)
        |DEFINE A AS A.tag = 'a', B AS B.tag = 'b', C AS C.tag = 'c'"""
        .stripMargin).as[(Int, Long)].collect().toList
    assert(ranged == List((1, 3L)))
  }

  test("ALL ROWS PER MATCH tags each row with classifier and match number") {
    val out = MatchRecognize(
      df((1, 1, 1.0, "a"), (1, 2, 2.0, "b"), (1, 3, 0.0, "x"),
        (1, 4, 3.0, "a"), (1, 5, 4.0, "b")),
      """PARTITION BY k
        |ORDER BY seq
        |ALL ROWS PER MATCH
        |PATTERN (A B)
        |DEFINE A AS A.tag = 'a', B AS B.tag = 'b'""".stripMargin)
      .select(col("seq"), col("classifier"), col("match_num"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toList
    assert(out == List(
      (1, "A", 1L), (2, "B", 1L), (4, "A", 2L), (5, "B", 2L)))
  }

  test("ALL ROWS PER MATCH rejects MEASURES (restricted subset)") {
    val e = intercept[IllegalArgumentException] {
      MatchRecognize(df((1, 1, 1.0, "a")),
        """PARTITION BY k
          |ORDER BY seq
          |MEASURES A.seq AS s
          |ALL ROWS PER MATCH
          |PATTERN (A)
          |DEFINE A AS A.tag = 'a'""".stripMargin)
    }
    assert(e.getMessage.contains("ALL ROWS PER MATCH"))
  }

  test("COUNT(S.col) skips nulls; COUNT(S.*) counts rows") {
    val out = MatchRecognize(
      df((1, 1, 10.0, "up"), (1, 2, null, "up"), (1, 3, 30.0, "up")),
      """PARTITION BY k
        |ORDER BY seq
        |MEASURES COUNT(UP.*) AS rows_, COUNT(UP.v) AS vals, SUM(UP.v) AS s
        |PATTERN (UP+)
        |DEFINE UP AS UP.tag = 'up'""".stripMargin)
      .as[(Int, Long, Long, Double)].collect().toList
    assert(out == List((1, 3L, 2L, 40.0)))
  }
}
