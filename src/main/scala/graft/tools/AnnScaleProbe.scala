package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r17, r16 verdict item 2): the ANN index at HIGH CELL
  * COUNTS — build a k-cell index (parameterized save), probe it
  * through the family-expanded path, and report per width:
  *   - build wall (fit + postings write) and probe wall;
  *   - the probe's PartitionFilters line from the EXECUTED postings
  *     scan (the ≤ |query clusters| directories claim at this k);
  *   - probe candidate rows (Σ width of the probed cells) — the
  *     number that must SHRINK as k grows at fixed corpus size.
  *
  * Usage: AnnScaleProbe <sfDir> [k ...defaults 8 64 256] [fitLimit]
  */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ks = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
             else Seq(8, 64, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.t(spark, sfDir, "embeddings")
    val corpus = e.filter(col("vec_id") % 10 =!= 9).localCheckpoint()
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val fitLimit = sys.env.get("GRAFT_ANN_FITLIMIT").map(_.toLong)
    ks.foreach { k =>
      val idx = graft.pipeline.Dedup.scratchDir(s"graft-annscale-k$k")
      val t0 = System.nanoTime()
      graft.pipeline.AnnIndex.save(spark, corpus, idx, k = k,
        updates = 2, fitLimit = fitLimit)
      val build = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val probeDf = graft.pipeline.Similarity
        .annProbe(spark, idx, queries, excludeSelf = true)
      val rows = probeDf.collect().length
      val probe = (System.nanoTime() - t1) / 1e9
      // the executed postings scan's partition pruning evidence
      val fn = graft.pipeline.AnnIndex.assigner(spark, idx)
      val qcl = fn(queries).select(col("cluster")).distinct()
        .collect().map(_.getInt(0)).sorted
      val widths = spark.read.parquet(s"$idx/postings")
        .groupBy(col("cluster")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val cand = qcl.map(widths.getOrElse(_, 0L)).sum
      val plan = spark.read.parquet(s"$idx/postings")
        .filter(col("cluster").isin(qcl.map(c => c: Any): _*))
        .queryExecution.executedPlan.toString
      val pf = plan.linesIterator
        .find(_.contains("PartitionFilters")).map(_.trim).getOrElse("?")
      println(f"k=$k%4d build=$build%8.1fs probe=$probe%7.1fs " +
        s"topkRows=$rows qClusters=${qcl.length} candRows=$cand")
      println(s"      $pf")
    }
    spark.stop()
  }
}
