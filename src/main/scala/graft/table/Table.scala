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
}

final class GroupedTable(df: DataFrame, keys: Seq[Column]) {
  /** select = group keys + aggregate expressions, Flink-style. */
  def select(aggs: String): Table = {
    val cols = Table.split(aggs)
    new Table(df.groupBy(keys: _*).agg(cols.head, cols.tail: _*))
  }
}

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
