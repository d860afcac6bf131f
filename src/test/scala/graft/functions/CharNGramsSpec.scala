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
}
