package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable capability: a Spark implementation plus (usually) an
  * ANSI-SQL oracle the driver runs in DuckDB over the same parquet
  * tables. Column names must match between the two exactly; every
  * query is made row-deterministic (explicit full ORDER BY, unique
  * tie-breakers) so hash comparison is stable.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

trait QueryModule {
  def queries: Seq[QueryDef]

  protected def q(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, Some(oracle.stripMargin.trim), fn)

  protected def qNoOracle(name: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, None, fn)
}

/** Assembles every module's queries; SparkEntry delegates here. */
object Registry {
  def modules: Seq[QueryModule] = Seq(
    graft.operators.RelationalQueries,
    graft.operators.ApiQueries,
    graft.functions.ScalarQueries,
    graft.streaming.StreamQueries,
    graft.pipeline.Dedup,
    graft.pipeline.Similarity,
    graft.pipeline.TextAnalysis,
    graft.pipeline.Multimodal,
    graft.cep.CepQueries,
    graft.table.TableQueries,
    graft.sources.SourceQueries,
    graft.operators.ScaleQueries
  )

  lazy val all: Seq[QueryDef] = {
    val qs = modules.flatMap(_.queries)
    val dup = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(",")}")
    qs
  }
}
