package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the private[sql] Column ⇄ Expression API —
  * the supported pattern for third-party Catalyst expressions (the
  * same access path SparkSessionExtensions-registered functions use
  * internally). Lives under org.apache.spark.sql so private[sql]
  * members resolve; nothing else from the internals is touched.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a 1-arg expression builder as a SQL temp function. */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Stop every active streaming query, then unload all loaded
    * state-store providers and their maintenance thread. Benchmarks call
    * this between timed runs so one streaming query's retained providers
    * (and the GC pressure of their state) don't tax whatever runs next
    * in the same JVM. Providers re-load lazily on the next streaming
    * query, so this is safe mid-session.
    */
  def resetStreamingState(spark: SparkSession): Unit = {
    spark.streams.active.foreach(_.stop())
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
  }

  /** Post-execution file-scan metrics from the FINAL adaptive plan:
    * (root path, partitions read, files read) per parquet scan —
    * the observable evidence that dynamic partition pruning actually
    * restricted a partitioned read (probe tooling; -1 where a metric
    * is absent, e.g. unpartitioned scans lack numPartitions). */
  def scanMetrics(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case f: FileSourceScanExec    => Seq(f)
      case other                    => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).map { f =>
      (f.relation.location.rootPaths.headOption.map(_.toString).getOrElse("?"),
        f.metrics.get("numPartitions").map(_.value).getOrElse(-1L),
        f.metrics.get("numFiles").map(_.value).getOrElse(-1L))
    }
  }
}
