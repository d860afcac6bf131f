package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** quality() must be a pure function of its Column argument — the
  * regression where the stopword term was hard-wired to a column
  * literally named `text` silently mis-scored derived columns. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("quality scores a renamed column identically to `text`") {
    val docs = Seq("the cat and the hat", "zzz qqq xxx")
      .toDF("body")
      .withColumn("text", col("body")) // decoy with the magic name
    val viaBody = docs.select(TextAnalysis.quality(col("body")).as("q"))
      .as[Double].collect().toSeq
    val viaText = docs.select(TextAnalysis.quality(col("text")).as("q"))
      .as[Double].collect().toSeq
    assert(viaBody == viaText)
    // and on a frame with NO column named text at all
    val only = Seq("the cat and the hat").toDF("body")
      .select(TextAnalysis.quality(col("body")).as("q"))
      .as[Double].collect().head
    assert(only == viaBody.head)
  }

  test("quality distinguishes stopword-rich from stopword-free text") {
    val q = Seq(("a", "the cat and the hat"), ("b", "zzz qqq xxx"))
      .toDF("id", "body")
      .select(col("id"), TextAnalysis.quality(col("body")).as("q"))
      .as[(String, Double)].collect().toMap
    assert(q("a") > q("b"))
  }
}
