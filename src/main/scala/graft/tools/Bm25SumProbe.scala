package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r17): split q177's cost — contribution join vs the
  * per-(query, doc) ordered-fold aggregate — and time an
  * exact-decimal-sum variant (order-free, map-side combinable) against
  * the registered sorted-fold, diffing their outputs. */
object Bm25SumProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.TopK
    def time[T](tag: String)(f: => T): T = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"BM25PROBE $tag ${ts.map(t => f"$t%.2f").mkString(" ")}")
      f
    }
    val contrib = graft.pipeline.TextAnalysis
      .bm25Contrib(spark, sfDir, 1.0).localCheckpoint()
    println(s"BM25PROBE contrib rows = ${contrib.count()}")
    time("contrib_only")(
      graft.pipeline.TextAnalysis.bm25Contrib(spark, sfDir, 1.0)
        .write.format("noop").mode("overwrite").save())
    def finish(scored: org.apache.spark.sql.DataFrame) = scored
      .groupBy(col("query_id"))
      .agg(TopK.topK(3)(round(col("score"), 4), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("doc_id"),
        col("col.score").as("score"), (col("pos") + 1).cast("int").as("rn"))
    val foldDf = finish(contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(expr(
        """aggregate(transform(array_sort(collect_list(struct(hw, c))),
          |  s -> s.c), CAST(0 AS DOUBLE), (a, x) -> a + x)""".stripMargin)
        .as("score")))
    val decDf = finish(contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("c").cast("decimal(28,6)")).cast("double").as("score")))
    time("fold_agg")(foldDf.write.format("noop").mode("overwrite").save())
    time("decimal_agg")(decDf.write.format("noop").mode("overwrite").save())
    val d = foldDf.exceptAll(decDf).count() + decDf.exceptAll(foldDf).count()
    println(s"BM25PROBE output diff rows = $d")
    spark.stop()
  }
}
