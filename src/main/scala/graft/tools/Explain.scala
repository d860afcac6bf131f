package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for selected queries to inspect
  * pushdown (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_RUN=true: execute first and dump the FINAL adaptive
    // plan (shows AQE join demotions and ReusedExchange stage dedup,
    // which the static plan hides)
    val run = sys.env.get("SPARK_GRAFT_RUN").contains("true")
    for (n <- args; d <- Registry.all.find(_.name == n)) {
      println(s"========== $n ==========")
      val df = d.fn(spark, sfDir)
      if (run) {
        df.collect() // drive THIS queryExecution so AQE finalizes it
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
