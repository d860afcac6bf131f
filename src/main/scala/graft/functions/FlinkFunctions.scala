package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** The reference's scalar/aggregate functions that Spark lacks as
  * built-ins (SURVEY §7.2 custom-work inventory), each at the lowest
  * viable altitude: compose built-ins where semantics allow, a typed
  * Aggregator for COLLECT, and a UDF only for SIMILAR TO's pattern
  * translation (regex rewriting is irreducibly procedural).
  */
object FlinkFunctions {

  /** SQL `x SIMILAR TO pattern` (stringExpressions.scala:126 Similar).
    * SQL-regex → Java-regex: % → .*, _ → ., full-string anchoring.
    * SIMILAR TO's own metacharacters — [...] classes, (|) alternation,
    * and the * + ? {n[,m]} quantifiers — share Java-regex syntax and
    * pass through untouched; only . ^ $ (literals in SQL-regex but
    * meta in Java) need escaping. */
  def similarToRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      c match {
        case '%' => sb.append(".*")
        case '_' => sb.append('.')
        case '\\' if i + 1 < pattern.length =>
          sb.append(java.util.regex.Pattern.quote(pattern.charAt(i + 1).toString))
          i += 1
        case '.' | '^' | '$' =>
          sb.append('\\').append(c)
        case other => sb.append(other)
      }
      i += 1
    }
    sb.append("$").toString
  }

  def similar(c: Column, pattern: String): Column =
    c.rlike(similarToRegex(pattern))

  /** (s1,e1) OVERLAPS (s2,e2) (time.scala:229 TemporalOverlaps). */
  def temporalOverlaps(s1: Column, e1: Column, s2: Column, e2: Column): Column =
    s1 <= e2 && s2 <= e1

  /** Numeric TRUNCATE(x, n) toward zero (mathExpressions.scala:497). */
  def truncateNumeric(x: Column, n: Int): Column = {
    val f = math.pow(10, n)
    signum(x) * floor(abs(x) * f) / f
  }

  /** SUM0: sum defaulting to 0 on empty/all-null input
    * (aggregations.scala Sum0). */
  def sum0(c: Column): Column = coalesce(sum(c), lit(0))

  /** COLLECT → multiset (MultisetTypeInfo; aggregations.scala:300):
    * typed Aggregator producing element→count. Partial maps merge
    * associatively, so Catalyst runs it map-side first. */
  class CollectAggregator[T] extends Aggregator[T, Map[T, Int], Map[T, Int]] {
    override def zero: Map[T, Int] = Map.empty
    override def reduce(b: Map[T, Int], a: T): Map[T, Int] =
      b.updated(a, b.getOrElse(a, 0) + 1)
    override def merge(b1: Map[T, Int], b2: Map[T, Int]): Map[T, Int] =
      b2.foldLeft(b1) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0) + v) }
    override def finish(r: Map[T, Int]): Map[T, Int] = r
    override def bufferEncoder: Encoder[Map[T, Int]] = Encoders.kryo[Map[T, Int]]
    override def outputEncoder: Encoder[Map[T, Int]] = Encoders.kryo[Map[T, Int]]
  }

  /** Untyped COLLECT for DataFrames: multiset as element→count map,
    * pure Catalyst (collect_list + higher-order functions). */
  def collectMultiset(c: Column): Column = {
    val arr = collect_list(c.cast("string"))
    map_from_entries(transform(array_sort(array_distinct(arr)),
      x => struct(x, size(filter(arr, y => y === x)))))
  }

  /** Multiset rendered "elem:count,..." sorted — portable comparisons. */
  def collectMultisetString(c: Column): Column = {
    val arr = collect_list(c.cast("string"))
    array_join(transform(array_sort(array_distinct(arr)),
      x => concat(x, lit(":"), size(filter(arr, y => y === x)).cast("string"))), ",")
  }

  /** Register the SQL-surface functions on a session. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("similar_to",
      (s: String, p: String) =>
        if (s == null || p == null) null.asInstanceOf[java.lang.Boolean]
        else java.lang.Boolean.valueOf(s.matches(similarToRegex(p))))
    spark.udf.register("truncate_num",
      (x: java.lang.Double, n: Int) =>
        if (x == null) null.asInstanceOf[java.lang.Double]
        else {
          val f = math.pow(10, n)
          java.lang.Double.valueOf(math.signum(x) * math.floor(math.abs(x) * f) / f)
        })
  }
}
