package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeUnicodeSpec extends SparkSpec {
  import spark.implicits._

  // all non-ASCII spelled as escapes so the source pins the exact
  // form: \u0301 combining acute, \u00e9 composed e-acute,
  // \u2460 circled one, \u0308 combining diaeresis
  test("NFC composes decomposed sequences; NFKC folds compatibility forms") {
    val df = Seq("cafe\u0301", "\u2460", "plain").toDF("s")
    val nfc = df.select(NormalizeUnicode.nfc(col("s")).as("n"))
      .as[String].collect().toSeq
    assert(nfc == Seq("caf\u00e9", "\u2460", "plain"))
    val nfkc = df.select(NormalizeUnicode.normalize(col("s"), "NFKC").as("n"))
      .as[String].collect().toSeq
    assert(nfkc == Seq("caf\u00e9", "1", "plain"))
  }

  test("idempotent, null-safe, and already-normalized input is unchanged") {
    val once = Seq("a\u0301b\u0308c").toDF("s")
      .select(NormalizeUnicode.nfc(col("s")).as("n"))
    val twice = once.select(NormalizeUnicode.nfc(col("n")).as("n"))
    assert(once.as[String].head() == twice.as[String].head())
    // a+acute composes to \u00e1; b+diaeresis has no precomposed
    // character, so NFC keeps it decomposed
    assert(once.as[String].head() == "\u00e1b\u0308c")
    val r = Seq(Some("x"), None).toDF("s")
      .select(NormalizeUnicode.nfc(col("s")).as("n")).collect()
    assert(r(0).getString(0) == "x" && r(1).isNullAt(0))
  }

  test("unknown form fails at plan time, not per row") {
    intercept[IllegalArgumentException] {
      NormalizeUnicode.normalize(col("s"), "NFX")
    }
  }

  test("q169 stays inside whole-stage codegen (no interpreted fallback)") {
    val df = graft.Registry.all.find(_.name == "q169_text_normalize").get
      .fn(spark, sf)
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes = whole-stage-codegen'd stages; the normalize
    // projection must carry one (no interpreted fallback)
    assert(plan.contains("*(1) Project") && plan.contains("normalize_unicode"))
  }
}
