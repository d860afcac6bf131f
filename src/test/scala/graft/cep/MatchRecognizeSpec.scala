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

  // v c v c v: a 2-link chain — the three skip strategies disagree
  private def chain = df(
    (1, 1, 1.0, "v"), (1, 2, 1.0, "c"), (1, 3, 1.0, "v"),
    (1, 4, 1.0, "c"), (1, 5, 1.0, "v"))

  private def links(skip: String) = MatchRecognize(chain,
    s"""PARTITION BY k
       |ORDER BY seq
       |MEASURES V.seq AS s, W.seq AS e
       |AFTER MATCH SKIP $skip
       |PATTERN (V C+ W)
       |DEFINE V AS V.tag = 'v', C AS C.tag = 'c', W AS W.tag = 'v'"""
      .stripMargin)
    .select(col("s"), col("e")).as[(Int, Int)].collect().sortBy(_._1).toList

  test("SKIP TO LAST resumes at the closing symbol: every chain link emits") {
    assert(links("PAST LAST ROW") == List((1, 3)))       // every OTHER link
    assert(links("TO LAST W") == List((1, 3), (3, 5)))   // every link
  }

  test("SKIP TO FIRST places the fence at the variable's first row") {
    // fence at C's first row still blocks restarting at V, so the
    // middle view (inside the skipped region) can reopen — same as
    // TO LAST W here; the distinct fence shows via TO FIRST W
    assert(links("TO FIRST W") == List((1, 3), (3, 5)))
  }

  test("SKIP TO FIRST of the start variable prunes nothing (non-throwing variant)") {
    // pruningId == the match's own first row and the skip-to prune is
    // STRICT (start < pruningId), so no candidate is discarded — the
    // reference SkipToElementStrategy default (shouldThrowException =
    // false); the scan cannot loop because the start index always
    // advances
    assert(links("TO FIRST V") == List((1, 3), (3, 5)))
  }

  test("reluctant quantifier takes the shortest completing block") {
    // v x p x p: B{1,3}? pairs the view with the EARLIEST purchase
    // ≥2 rows later; greedy B{1,3} consumes 3 rows and demands the
    // purchase at exactly the 4th
    val d = df((1, 1, 1.0, "v"), (1, 2, 1.0, "x"), (1, 3, 1.0, "p"),
      (1, 4, 1.0, "x"), (1, 5, 1.0, "p"))
    def run(q: String) = MatchRecognize(d,
      s"""PARTITION BY k
         |ORDER BY seq
         |MEASURES V.seq AS s, P.seq AS e, COUNT(B.*) AS gap
         |AFTER MATCH SKIP TO NEXT ROW
         |PATTERN (V B$q P)
         |DEFINE V AS V.tag = 'v', P AS P.tag = 'p'""".stripMargin)
      .select(col("s"), col("e"), col("gap")).as[(Int, Int, Long)]
      .collect().toList
    assert(run("{1,3}?") == List((1, 3, 1L))) // earliest purchase
    assert(run("{1,3}") == List((1, 5, 3L)))  // greedy: 4th row exactly
  }

  test("grouped SQL pattern repeats the sub-sequence consecutively") {
    // a b a b x a b: (A B){2} matches rows 1-4 only; the second
    // potential start (row 6's pair) has no second adjacent pair
    val d = df((1, 1, 1.0, "a"), (1, 2, 1.0, "b"), (1, 3, 1.0, "a"),
      (1, 4, 1.0, "b"), (1, 5, 1.0, "x"), (1, 6, 1.0, "a"), (1, 7, 1.0, "b"))
    val out = MatchRecognize(d,
      """PARTITION BY k
        |ORDER BY seq
        |MEASURES FIRST(A.seq) AS fa, LAST(B.seq) AS lb, COUNT(A.*) AS na
        |PATTERN ( (A B){2} )
        |DEFINE A AS A.tag = 'a', B AS B.tag = 'b'""".stripMargin)
      .select(col("fa"), col("lb"), col("na")).as[(Int, Int, Long)]
      .collect().toList
    assert(out == List((1, 4, 2L)))
  }

  test("grouped pattern with oneOrMore backtracks for the tail symbol") {
    // (A B)+ C: greedy wants both pairs but C must directly follow —
    // here it does, after two pairs
    val d = df((1, 1, 1.0, "a"), (1, 2, 1.0, "b"), (1, 3, 1.0, "a"),
      (1, 4, 1.0, "b"), (1, 5, 1.0, "c"))
    val out = MatchRecognize(d,
      """PARTITION BY k
        |ORDER BY seq
        |MEASURES COUNT(A.*) AS na, C.seq AS cs
        |PATTERN ( (A B)+ C )
        |DEFINE A AS A.tag = 'a', B AS B.tag = 'b', C AS C.tag = 'c'"""
        .stripMargin)
      .select(col("na"), col("cs")).as[(Long, Int)].collect().toList
    assert(out == List((2L, 5)))
  }

  test("nested SQL groups parse and repeat recursively") {
    // ( A (B){2} ){2}: a b b a b b matches once; the inner (B){2}
    // nests inside the repeated outer group
    val d = df((1, 1, 1.0, "a"), (1, 2, 1.0, "b"), (1, 3, 1.0, "b"),
      (1, 4, 1.0, "a"), (1, 5, 1.0, "b"), (1, 6, 1.0, "b"))
    val out = MatchRecognize(d,
      """PARTITION BY k
        |ORDER BY seq
        |MEASURES COUNT(A.*) AS na, COUNT(B.*) AS nb, LAST(B.seq) AS lb
        |PATTERN ( ( A (B){2} ){2} )
        |DEFINE A AS A.tag = 'a', B AS B.tag = 'b'""".stripMargin)
      .select(col("na"), col("nb"), col("lb")).as[(Long, Long, Int)]
      .collect().toList
    assert(out == List((2L, 4L, 6)))
  }

  test("SUM/AVG/MIN/MAX reject the star argument at parse time") {
    val e = intercept[IllegalArgumentException] {
      MatchRecognize(df((1, 1, 1.0, "a")),
        """PARTITION BY k
          |ORDER BY seq
          |MEASURES SUM(A.*) AS s
          |PATTERN (A)
          |DEFINE A AS A.tag = 'a'""".stripMargin)
    }
    assert(e.getMessage.contains("only COUNT"))
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
