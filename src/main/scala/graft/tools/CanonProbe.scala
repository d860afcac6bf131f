package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: the q211 preGate dial's wall/selectivity probe (r13).
  * Runs quality-aware canonicalization either ungated (the q211
  * oracle path) or with the Gopher pre-gate (the q221 composition
  * order exposed as a dial), to a noop count — one mode per JVM so
  * the probe script gets fresh-JVM walls for both rows.
  *
  * Usage: CanonProbe <sfDir> <ungated|pregate>
  */
object CanonProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, mode) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val out = graft.pipeline.Quality
      .canonicalize(docs, preGate = mode == "pregate")
    val agg = out.agg(count(lit(1)).as("rows"), sum(col("keep")).as("kept"))
      .collect()(0)
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[canonprobe] sfDir=$sfDir mode=$mode nDocs=$nDocs " +
      f"rows=${agg.getAs[Long]("rows")} kept=${agg.getAs[Long]("kept")} " +
      f"wall=$wall%.1f s")
    spark.stop()
  }
}
