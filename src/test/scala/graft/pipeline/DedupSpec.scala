package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LSH bucket-width cap: degenerate (boilerplate) buckets drop out of
  * the candidate join; the default keeps exact semantics. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("maxBucketWidth drops degenerate buckets, default keeps them") {
    // 6 identical boilerplate docs (one giant bucket per band) plus a
    // genuine near-dup pair
    val boiler = (0 until 6).map(i => (100L + i, "alpha beta gamma delta epsilon"))
    val docs = (boiler ++ Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five seven"))).toDF("doc_id", "text")

    val exact = Dedup.lshVerifiedPairs(docs)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    // all boilerplate pairs (15) + the genuine pair
    assert(exact((1L, 2L)) && exact.count(p => p._1 >= 100) == 15)

    val capped = Dedup.lshVerifiedPairs(docs, maxBucketWidth = 4)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    // the 6-wide boilerplate buckets are dropped; the real pair stays
    assert(capped == Set((1L, 2L)))
  }
}
