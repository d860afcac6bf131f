package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FlinkFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("similarToRegex translates SQL wildcards and anchors") {
    assert(FlinkFunctions.similarToRegex("%(ot|in)%") == "^.*(ot|in).*$")
    assert(FlinkFunctions.similarToRegex("h_t %") == "^h.t .*$")
    assert("hot plate".matches(FlinkFunctions.similarToRegex("h_t %")))
    assert(!"hat".matches(FlinkFunctions.similarToRegex("h_t %")))
    // regex metachars in the SQL pattern are literal
    assert("a.b".matches(FlinkFunctions.similarToRegex("a.b")))
    assert(!"axb".matches(FlinkFunctions.similarToRegex("a.b")))
    // SIMILAR TO quantifiers * + ? {n} are META (SQL:2016 ch.9) — they
    // quantify, not match literally
    assert("aaab".matches(FlinkFunctions.similarToRegex("a+b")))
    assert("b".matches(FlinkFunctions.similarToRegex("a*b")))
    assert("ab".matches(FlinkFunctions.similarToRegex("a?b")))
    assert("aab".matches(FlinkFunctions.similarToRegex("a{2}b")))
    assert(!"ab".matches(FlinkFunctions.similarToRegex("a{2}b")))
    // escaped quantifier is literal
    assert("a+b".matches(FlinkFunctions.similarToRegex("a\\+b")))
  }

  test("truncateNumeric truncates toward zero") {
    val r = Seq(3.19, -3.19, 0.0).toDF("x")
      .select(FlinkFunctions.truncateNumeric(col("x"), 1).as("t"))
      .as[Double].collect().toSeq
    assert(r == Seq(3.1, -3.1, 0.0))
  }

  test("sum0 yields 0 on empty input") {
    val r = Seq(1, 2, 3).toDF("x").filter(col("x") > 10)
      .agg(FlinkFunctions.sum0(col("x"))).as[Long].collect()
    assert(r.toSeq == Seq(0L))
  }

  test("temporalOverlaps matches interval intersection") {
    val df = Seq((1, 5, 3, 8), (1, 2, 3, 4)).toDF("s1", "e1", "s2", "e2")
    val r = df.select(FlinkFunctions.temporalOverlaps(
      col("s1"), col("e1"), col("s2"), col("e2"))).as[Boolean].collect().toSeq
    assert(r == Seq(true, false))
  }

  test("CollectAggregator builds multiset with counts") {
    val agg = new FlinkFunctions.CollectAggregator[String]
    val m = agg.merge(
      agg.reduce(agg.reduce(agg.zero, "a"), "b"),
      agg.reduce(agg.zero, "a"))
    assert(agg.finish(m) == Map("a" -> 2, "b" -> 1))
  }

  test("collectMultisetString renders sorted elem:count") {
    val r = Seq("b", "a", "b").toDF("x")
      .agg(FlinkFunctions.collectMultisetString(col("x"))).as[String].collect()
    assert(r.toSeq == Seq("a:1,b:2"))
  }

  test("topKStr tie-breaks in UTF-8 byte order, not UTF-16 code units") {
    // U+FFFD (UTF-8 EF BF BD) vs U+1F600 (UTF-8 F0 9F 98 80): UTF-16
    // puts the surrogate pair (D83D DE00) BELOW FFFD; UTF-8 byte order
    // — Spark's UTF8String sort and DuckDB's default collation — puts
    // it ABOVE. The score-tied top-1 must be U+FFFD (r12 ADVICE).
    val repl = "\uFFFD"
    val emoji = new String(Character.toChars(0x1F600))
    assert(repl > emoji, "JVM UTF-16 order must differ for this pair")
    val r = Seq((1.0, emoji), (1.0, repl)).toDF("score", "id")
      .agg(TopK.topKStr(1)(col("score"), col("id")).as("t"))
      .select(element_at(col("t"), 1).getField("id")).as[String].collect()
    assert(r.toSeq == Seq(repl),
      "score-tied topKStr must pick the UTF-8-smaller id")
  }
}
