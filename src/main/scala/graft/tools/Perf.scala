package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession

/** Dev-only micro-probe: times selected queries N times in one session
  * to separate plan cost from first-run JIT/listing overhead. */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"PERF $tag ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("calib_range_sum")(spark.range(100000000L).selectExpr("sum(id)").collect())
    time("calib_shuffle")(spark.range(1000000L).selectExpr("id % 100 as k", "id as v")
      .groupBy("k").sum("v").collect())
    time("calib_scan")(spark.read.parquet(s"$sfDir/lineitem.parquet").count())
    time("calib_scan_agg")(spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect())
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_pricing_summary", "q03_join_inner", "q28_explode_words")
    for (n <- names; d = Registry.all.find(_.name == n).get) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        d.fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PERF $n ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
