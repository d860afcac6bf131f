package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: run ONE Registry query with a streaming listener attached
  * and print the per-run micro-batch cost breakdown — how much of a
  * streaming query's wall time is trigger execution, addBatch, state
  * commit, offset-log bookkeeping. This is the attribution data behind
  * PLANS.md's streaming cost notes (e.g. the q136 floor).
  *
  * Usage: StreamProbe <sfDir> <queryName>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, name) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dur = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val counters = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    def add(m: java.util.concurrent.ConcurrentHashMap[String, Long],
        k: String, v: Long): Unit = m.merge(k, v, (a, b) => a + b)

    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        add(counters, "microBatches", 1L)
        add(counters, "inputRows", p.numInputRows)
        p.durationMs.forEach((k, v) => add(dur, k, v.longValue))
        p.stateOperators.zipWithIndex.foreach { case (so, i) =>
          // last-progress state rows PER OPERATOR (r13: q193 has two
          // stateful stages; a single overwritten counter hid the
          // first stage's eviction behavior)
          counters.put(s"stateRowsTotal_op$i", so.numRowsTotal)
          add(dur, "stateAllUpdates", so.allUpdatesTimeMs)
          add(dur, "stateAllRemovals", so.allRemovalsTimeMs)
          add(dur, "stateCommit", so.commitTimeMs)
        }
      }
    })

    val d = graft.Registry.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))
    val t0 = System.nanoTime()
    d.fn(spark, dir).count()
    val wallSec = (System.nanoTime() - t0) / 1e9

    import scala.jdk.CollectionConverters._
    val ds = dur.asScala.toSeq.sortBy(-_._2)
      .map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val cs = counters.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(f"""{"query":"$name","wallSec":$wallSec%.3f,$cs,"durationMsTotals":{$ds}}""")
    spark.stop()
  }
}
