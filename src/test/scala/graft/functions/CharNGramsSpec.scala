package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CharNGramsSpec extends SparkSpec {
  import spark.implicits._

  test("char_ngrams matches the substring composite") {
    val df = Seq("hello", "ab", "abc", "").toDF("s")
    val native = df.select(CharNGrams.char_ngrams(col("s"), 3).as("g"))
      .as[Seq[String]].collect().toSeq
    val composite = df.select(
      expr("""CASE WHEN length(s) < 3 THEN array()
             |ELSE transform(sequence(1, length(s)-2), i -> substring(s, i, 3)) END"""
        .stripMargin).as("g"))
      .as[Seq[String]].collect().toSeq
    assert(native == composite)
    assert(native.head == Seq("hel", "ell", "llo"))
    assert(native(1) == Seq.empty)
  }

  test("char_ngrams participates in codegen (no fallback errors) and nulls pass through") {
    val df = Seq(Some("abcd"), None).toDF("s")
    val r = df.select(CharNGrams.char_ngrams(col("s"), 2).as("g"))
      .collect()
    assert(r(0).getSeq[String](0) == Seq("ab", "bc", "cd"))
    assert(r(1).isNullAt(0))
  }

  test("sorted_intersect_size_long merges primitive arrays correctly") {
    val df = Seq(
      (Seq(1L, 3L, 5L, 9L), Seq(2L, 3L, 5L, 10L)),  // {3,5}
      (Seq.empty[Long], Seq(1L, 2L)),                // empty side
      (Seq(7L), Seq(7L))                             // identical singletons
    ).toDF("a", "b")
    val r = df.select(SortedIntersectSize
        .sorted_intersect_size_long(col("a"), col("b")).as("n"))
      .as[Int].collect().toSeq
    assert(r == Seq(2, 0, 1))
  }
}
