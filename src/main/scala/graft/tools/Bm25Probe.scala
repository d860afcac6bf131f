package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: BM25 pruning-dial comparison with the noise controlled.
  * Cross-JVM wall clocks at the 100× corpus swing ±30 % in this
  * sandbox (three r12 attempts disagreed on the SIGN of the dial's
  * effect), so this probe runs every dial setting in ONE JVM,
  * ALTERNATING settings across repetitions (environment drift hits
  * all settings equally), and reports per-setting medians plus the
  * deterministic work metric (contribution rows = postings volume
  * entering the score join — the thing the dial exists to cut).
  *
  * Usage: Bm25Probe <sfDir> [reps]
  */
object Bm25Probe {
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
    val dials = Seq(1.0, 0.3, 0.1)
    // warm-up: one full pass per dial (file listing, codegen, JIT)
    dials.foreach(d => graft.pipeline.TextAnalysis.bm25TopK(spark, sfDir,
      maxDfFrac = d).write.format("noop").mode("overwrite").save())
    val times = scala.collection.mutable.Map[Double, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; d <- dials) {
      val t0 = System.nanoTime()
      graft.pipeline.TextAnalysis.bm25TopK(spark, sfDir, maxDfFrac = d)
        .write.format("noop").mode("overwrite").save()
      times(d) = times(d) :+ (System.nanoTime() - t0) / 1e9
    }
    dials.foreach { d =>
      val ts = times(d).sorted
      val med = ts(ts.length / 2)
      // the deterministic work metric: postings volume entering the
      // score join — the thing the dial exists to cut; immune to the
      // ±30% wall-clock swings that flipped three r12 attempts
      val work = graft.pipeline.TextAnalysis
        .bm25Contrib(spark, sfDir, maxDfFrac = d).count()
      println(f"[bm25probe] maxDfFrac=$d%.1f median=$med%.2f s " +
        f"contribRows=$work%d runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
  }
}
