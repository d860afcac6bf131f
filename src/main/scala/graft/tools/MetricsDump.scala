package graft.tools

import graft.Registry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev tool (r18): run ONE registry query through the noop sink and
  * print the final adaptive plan with PER-NODE RUNTIME METRICS
  * (output rows, codegen/agg/join times, shuffle bytes) — the SQL-tab
  * view for a UI-less sandbox (guide §7.1/§7.2).
  *
  * Usage: MetricsDump <sfDir> <queryName>
  */
object MetricsDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = Registry.all.find(_.name == name).getOrElse(
      sys.error(s"unknown query $name"))
    // wall-clock attribution: one line per JOB (start offset, duration,
    // #tasks) — serial gaps between jobs are driver-side work
    val t0 = System.nanoTime()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.put(e.jobId, (System.nanoTime(),
            e.stageInfos.map(_.numTasks).sum))
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (s, nt) = jobs.getOrDefault(e.jobId, (System.nanoTime(), -1))
          println(f"[job] id=${e.jobId}%3d start=${(s - t0) / 1e9}%6.2f " +
            f"dur=${(System.nanoTime() - s) / 1e9}%6.3f tasks=$nt%4d")
        }
        private val taskTimes = new java.util.concurrent.ConcurrentHashMap[
          Int, Vector[Long]]()
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          taskTimes.merge(e.stageId,
            Vector(e.taskInfo.duration), (a, b) => a ++ b)
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          val i = e.stageInfo
          val ts = taskTimes.getOrDefault(i.stageId, Vector.empty).sorted
          val med = if (ts.isEmpty) 0L else ts(ts.length / 2)
          println(f"[stage] id=${i.stageId}%3d name=${i.name.take(40)}%-40s " +
            f"tasks=${i.numTasks}%4d wall=${
              i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
            }%6d ms taskMed=$med%5d taskMax=${ts.lastOption.getOrElse(0L)}%6d " +
            f"taskSum=${ts.sum}%7d")
        }
      })
    // warm-up run (JIT, codegen cache, listing) — the bench discards
    // run 1 too; metrics below come from the WARM run
    d.fn(spark, dir).collect()
    println(s"[job] ===== warm run starts =====")
    val df = d.fn(spark, dir)
    // collect() (not a write) so THIS queryExecution is the executed
    // one and its metric accumulators fill; output sizes here are tiny
    df.collect()
    println(f"[job] TOTAL ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    def walk(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.map { case (k, m) =>
        s"$k=${m.value}"
      }.mkString(", ")
      println(("  " * depth) + p.nodeName + "  [" + ms + "]")
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      kids.foreach(walk(_, depth + 1))
      p.subqueries.foreach { sq =>
        println(("  " * (depth + 1)) + "SUBQUERY:")
        walk(sq, depth + 2)
      }
    }
    walk(df.queryExecution.executedPlan, 0)
    spark.stop()
  }
}
