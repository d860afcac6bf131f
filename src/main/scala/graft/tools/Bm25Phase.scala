package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r18): per-phase attribution of q177's wall time — times
  * the contribution pipeline's stages separately in one JVM so the
  * optimization targets the stage that actually costs (guide §1.1).
  *
  * Usage: Bm25Phase <sfDir> [reps]
  */
object Bm25Phase {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.Tables
    def hexHash(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 8), 16, 10).cast("long")
    def h = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .withColumn("hw", hexHash(col("word")))
    val isQ = col("doc_id") % 97 === 0
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[bm25phase] $tag%-28s median=${ts(ts.length / 2)}%.2f s " +
        ts.map(t => f"$t%.2f").mkString("(", ",", ")"))
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // counts once, for the record
    val qt = h.filter(isQ).select(col("doc_id").as("query_id"), col("hw")).distinct()
    val qTerms = qt.select(col("hw")).distinct()
    val nInst = h.filter(!isQ).count()
    val nInstQ = h.filter(!isQ).join(broadcast(qTerms), Seq("hw"), "left_semi").count()
    val corpAll = h.filter(!isQ).groupBy(col("doc_id"), col("hw")).agg(count(lit(1)).as("tf"))
    val nCorp = corpAll.count()
    val nCorpQ = h.filter(!isQ).join(broadcast(qTerms), Seq("hw"), "left_semi")
      .groupBy(col("doc_id"), col("hw")).agg(count(lit(1)).as("tf")).count()
    val nQt = qt.count(); val nQT = qTerms.count()
    println(s"[bm25phase] instances=$nInst instancesQTerm=$nInstQ " +
      s"corpRows=$nCorp corpRowsQTerm=$nCorpQ qtRows=$nQt qTerms=$nQT")
    time("explode_only")(noop(h.filter(!isQ)))
    time("qt_distinct")(noop(qt))
    time("corp_agg_all")(noop(corpAll))
    time("corp_agg_prefiltered")(noop(
      h.filter(!isQ).join(broadcast(qTerms), Seq("hw"), "left_semi")
        .groupBy(col("doc_id"), col("hw")).agg(count(lit(1)).as("tf"))))
    time("dl_agg")(noop(h.filter(!isQ).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))))
    time("contrib_full")(noop(
      graft.pipeline.TextAnalysis.bm25Contrib(spark, sfDir, 1.0)))
    time("q177_full")(noop(
      graft.pipeline.TextAnalysis.bm25TopK(spark, sfDir)))
    spark.stop()
  }
}
