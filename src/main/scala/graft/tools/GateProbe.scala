package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the sampleFrac training dial's fitness probe (r12
  * verdict item 3). Trains the q212 gate on a deterministic
  * content-hash sample of the corpus, serves BOTH models over the
  * full corpus, and reports (a) serve-verdict agreement between the
  * sampled and full models and (b) each model's agreement with the
  * heuristic teacher — the numbers that justify training on ~10% at
  * 100 TB (5 of 6 corpus passes are training; serving is one map).
  *
  * Usage: GateProbe <sfDir> [frac=0.1]
  */
object GateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val frac = args.lift(1).map(_.toDouble).getOrElse(0.1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val full = graft.pipeline.Quality.gateModel(spark, sfDir)
    val tFull = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val sampled = graft.pipeline.Quality.gateModel(spark, sfDir, frac)
    val tSamp = (System.nanoTime() - t1) / 1e9
    val vf = graft.pipeline.Quality.gateVerdicts(spark, sfDir, full)
      .withColumnRenamed("admitted", "a_full")
    val vs = graft.pipeline.Quality.gateVerdicts(spark, sfDir, sampled)
      .withColumnRenamed("admitted", "a_samp")
    val teacher = graft.Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"),
        (graft.pipeline.TextAnalysis.quality(col("text")) >= 0.5)
          .cast("int").as("y"))
    val j = vf.join(vs, "doc_id").join(teacher, "doc_id").localCheckpoint()
    val n = j.count().toDouble
    def rate(c: org.apache.spark.sql.Column): Double =
      j.filter(c).count() / n
    println(f"[gateprobe] sfDir=$sfDir frac=$frac%.2f n=${n.toLong}")
    println(f"[gateprobe] trainWall full=$tFull%.1f s sampled=$tSamp%.1f s")
    println(f"[gateprobe] serveAgreement(sampled vs full)=${
      rate(col("a_full") === col("a_samp"))}%.4f")
    println(f"[gateprobe] teacherAgreement full=${
      rate(col("a_full") === col("y"))}%.4f sampled=${
      rate(col("a_samp") === col("y"))}%.4f")
    spark.stop()
  }
}
