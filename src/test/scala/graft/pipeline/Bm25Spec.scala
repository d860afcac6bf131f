package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The BM25 approximate-pruning dial (maxDfFrac): default off must be
  * bit-identical to the oracle-pinned registry query; dialed on, hot
  * (high-df, near-zero-idf) terms drop from the query side before the
  * postings join, only ever REMOVING epsilon contributions.
  */
class Bm25Spec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toString)

  test("dial default-off is exactly the registry q177 result") {
    val registry = graft.Registry.all.find(_.name == "q177_bm25_topk").get
      .fn(spark, sf)
    assert(rows(TextAnalysis.bm25TopK(spark, sf))
      .sameElements(rows(registry)))
  }

  test("dial gates the postings join and only removes score epsilon") {
    // maxDfFrac = 0: every term pruned, nothing reaches the join
    assert(TextAnalysis.bm25TopK(spark, sf, maxDfFrac = 0.0).count() == 0)

    val exact = TextAnalysis.bm25TopK(spark, sf)
      .select(col("query_id"), col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val dialed = TextAnalysis.bm25TopK(spark, sf, maxDfFrac = 0.3)
    val d = dialed
      .select(col("query_id"), col("doc_id"), col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(d.nonEmpty, "0.3 dial must still retrieve")
    // dropping terms can only lower a (query, doc) score (idf ≥ 0 ⇒
    // every contribution ≥ 0); allow the 4-dp rounding grain
    val common = d.keySet.intersect(exact.keySet)
    assert(common.nonEmpty)
    assert(common.forall(k => d(k) <= exact(k) + 1e-4),
      "pruning must never raise a score")
    // and on this corpus the 0.3 dial actually bites somewhere
    assert(common.exists(k => d(k) < exact(k) - 1e-4)
      || d.keySet != exact.keySet,
      "dial had no observable effect — threshold not exercised")
  }
}
