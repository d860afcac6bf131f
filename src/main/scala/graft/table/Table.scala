package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.expr

/** Flink Table-API-style fluent relational surface (reference
  * table.scala:1, 1492 LoC: select/filter/where/groupBy/join/union/
  * orderBy/fetch/offset with string expressions) as a thin veneer on
  * DataFrame — string expressions parse through Catalyst's `expr`, so
  * the optimizer sees exactly the same plan a DataFrame user gets.
  */
final class Table(val df: DataFrame) {

  private def split(exprs: String): Seq[Column] = Table.split(exprs)

  def select(exprs: String): Table = new Table(df.select(split(exprs): _*))
  def filter(cond: String): Table = new Table(df.filter(expr(cond)))
  def where(cond: String): Table = filter(cond)

  def groupBy(keys: String): GroupedTable = new GroupedTable(df, split(keys))

  def join(right: Table, cond: String): Table =
    new Table(df.join(right.df, expr(cond)))
  def leftOuterJoin(right: Table, cond: String): Table =
    new Table(df.join(right.df, expr(cond), "left"))
  def rightOuterJoin(right: Table, cond: String): Table =
    new Table(df.join(right.df, expr(cond), "right"))
  def fullOuterJoin(right: Table, cond: String): Table =
    new Table(df.join(right.df, expr(cond), "full"))

  def union(right: Table): Table = new Table(df.union(right.df).distinct())
  def unionAll(right: Table): Table = new Table(df.union(right.df))
  def intersect(right: Table): Table = new Table(df.intersect(right.df))
  def intersectAll(right: Table): Table = new Table(df.intersectAll(right.df))
  def minus(right: Table): Table = new Table(df.except(right.df))
  def minusAll(right: Table): Table = new Table(df.exceptAll(right.df))
  def distinct: Table = new Table(df.distinct())

  /** addColumns/renameColumns/dropColumns (table.scala column ops). */
  def addColumns(exprs: String): Table =
    new Table(Table.splitRaw(exprs).foldLeft(df) { (d, item) =>
      """(?is)(.*\S)\s+AS\s+(\w+)\s*$""".r.findFirstMatchIn(item) match {
        case Some(m) => d.withColumn(m.group(2), expr(m.group(1)))
        case None => throw new IllegalArgumentException(
          s"addColumns needs '<expr> AS <name>' items, got: $item")
      }
    })
  def renameColumns(pairs: String): Table =
    new Table(pairs.split(",").map(_.trim).foldLeft(df) { (d, p) =>
      val Array(from, to) = p.split("(?i)\\s+AS\\s+").map(_.trim)
      d.withColumnRenamed(from, to)
    })
  def dropColumns(cols: String): Table =
    new Table(df.drop(cols.split(",").map(_.trim).toSeq: _*))

  def orderBy(exprs: String): Table = new Table(df.orderBy(split(exprs): _*))
  def fetch(n: Int): Table = new Table(df.limit(n))
  def offset(n: Int): Table = new Table(df.offset(n))

  def as(alias: String): Table = new Table(df.as(alias))
  def toDF: DataFrame = df

  /** Register this table as a row-time versioned temporal table
    * function (reference table.scala:188-215
    * createTemporalTableFunction): versions are keyed by `primaryKey`
    * and ordered by `timeAttribute`; `seqColumn` breaks equal-time
    * version ties (highest wins; omit when (key, time) is unique).
    * The remaining single column is the version payload — the
    * restricted subset this engine's state op carries. Apply with
    * [[joinLateralAsOf]] on the probe side. */
  def createTemporalTableFunction(timeAttribute: String, primaryKey: String,
      seqColumn: String = null): TemporalTableFunction = {
    val payload = df.columns.toSeq
      .filterNot(c => c == timeAttribute || c == primaryKey || c == seqColumn)
    require(payload.size == 1,
      s"temporal table function subset carries exactly one payload column, " +
        s"found ${payload.mkString(", ")}")
    TemporalTableFunction(df, timeAttribute, primaryKey,
      Option(seqColumn), payload.head)
  }

  /** probe ⋈ fn FOR SYSTEM_TIME AS OF probe.`probeTime` (reference
    * joinLateral over a registered TemporalTableFunction): each probe
    * row pairs with the latest version at or before its time for the
    * same key, sealed by the watermark (`delay`). Output columns:
    * (`probeId`, fn's payload). Works on streams — both sides union
    * under one watermark — and on batch frames run through the same
    * state op. */
  def joinLateralAsOf(fn: TemporalTableFunction, probeTime: String,
      probeKey: String, probeId: String, delay: String = "0 seconds"): Table = {
    import org.apache.spark.sql.functions.{col, lit}
    val probe = df.select(col(probeKey).as("key"), col(probeTime).as("ts"),
      col(probeId).cast("long").as("seq"), col(probeId).cast("long").as("probeId"))
    val build = fn.build.select(col(fn.primaryKey).as("key"),
      col(fn.timeAttribute).as("ts"),
      fn.seqColumn.map(c => col(c).cast("long")).getOrElse(lit(0L)).as("seq"),
      col(fn.payload).cast("double").as("value"))
    new Table(graft.streaming.TemporalJoin.rowTime(probe, build, delay)
      .toDF(probeId, fn.payload))
  }
}

final class GroupedTable(df: DataFrame, keys: Seq[Column]) {
  /** select = group keys + aggregate expressions, Flink-style. */
  def select(aggs: String): Table = {
    val cols = Table.split(aggs)
    new Table(df.groupBy(keys: _*).agg(cols.head, cols.tail: _*))
  }
}

/** A registered row-time versioned table function handle (reference
  * TemporalTableFunction, table.scala:188-215): the build-side frame
  * plus the metadata a FOR SYSTEM_TIME AS OF application needs. */
final case class TemporalTableFunction(
    build: DataFrame,
    timeAttribute: String,
    primaryKey: String,
    seqColumn: Option[String],
    payload: String)

object Table {
  def apply(df: DataFrame): Table = new Table(df)

  /** split an expression list on top-level commas only. */
  private[table] def split(s: String): Seq[Column] =
    splitRaw(s).map(e => expr(e))

  /** Top-level comma split (commas inside parens/strings kept). */
  private[table] def splitRaw(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    val cur = new StringBuilder
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case ',' if depth == 0 && !inStr => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }
}
