package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r17): split the standing-ANN-index lifecycle cost into
  * its phases — model fit+save, delta assign+append, partition-pruned
  * probe — so optimization effort lands on the phase that pays. */
object AnnLifeProbe {
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
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"ANNPROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val e = graft.Tables.t(spark, sfDir, "embeddings")
    val corpus = e.filter(col("vec_id") % 10 =!= 9)
    for (round <- 1 to 3) {
      val idx = graft.pipeline.Dedup.scratchDir(s"graft-annprobe-$round")
      time(s"r$round save")(graft.pipeline.AnnIndex.save(spark, corpus, idx))
      val fn = time(s"r$round assigner")(
        graft.pipeline.AnnIndex.assigner(spark, idx))
      time(s"r$round append")(graft.pipeline.AnnIndex.append(
        fn(e.filter(col("vec_id") % 10 === 9)), idx, epoch = 0L))
      time(s"r$round probe")(graft.pipeline.Similarity.annProbe(spark, idx,
        corpus.filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding")),
        excludeSelf = true)
        .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
