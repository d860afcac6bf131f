package graft.cep

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Restricted SQL MATCH_RECOGNIZE (reference DataStreamMatch.scala:65,
  * runtime/match/) — the subset:
  *
  *   MATCH_RECOGNIZE (
  *     PARTITION BY <col>
  *     ORDER BY <col> [, <col>]
  *     MEASURES S.col AS alias [, ...]
  *     [AFTER MATCH SKIP PAST LAST ROW | AFTER MATCH SKIP TO NEXT ROW]
  *     PATTERN (A B+ C? ...)        -- symbols with ?, +, {n}
  *     DEFINE A AS <predicate on A.col>, ...
  *   )
  *
  * AFTER MATCH defaults to SKIP PAST LAST ROW (the SQL-standard and
  * reference default, flink-table .../match/PatternVisitor); SKIP TO
  * NEXT ROW maps to the matcher's every-start mode. SKIP TO
  * FIRST/LAST <symbol> are outside the subset and rejected.
  * Undefined pattern symbols match any row (SQL default). Execution is
  * the scalable sort-based shape: per-symbol predicates become boolean
  * columns (Catalyst expressions), rows hash-partition by the key and
  * sort within partitions, and the NFA runs streamed per key group —
  * no per-key shuffle beyond the one repartition, no group
  * materialization besides the active key's run.
  */
object MatchRecognize {

  final case class Clause(
      partitionBy: String,
      orderBy: Seq[String],
      measures: Seq[(String, String, String)], // (symbol, col, alias)
      pattern: Seq[(String, Int, Int)],        // (symbol, minTimes, maxTimes)
      define: Map[String, String],
      skip: CEP.AfterMatchSkip)

  private val measureRe = """(?i)(\w+)\.(\w+)\s+AS\s+(\w+)""".r
  private val symRe = """(\w+)(\+|\?|\{(\d+)\})?""".r

  def parse(clause: String): Clause = {
    def section(name: String, endAt: String): Option[String] = {
      val re = s"""(?is)$name\\s+(.*?)\\s*(?=$endAt)""".r
      re.findFirstMatchIn(clause).map(_.group(1).trim)
    }
    val partitionBy = section("PARTITION BY", "ORDER BY").getOrElse(
      throw new IllegalArgumentException("PARTITION BY required"))
    val orderBy = section("ORDER BY", "MEASURES").getOrElse(
      throw new IllegalArgumentException("ORDER BY required"))
      .split(",").map(_.trim).toSeq
    val measures = section("MEASURES", """(?:AFTER\s+MATCH|PATTERN)""").getOrElse("")
      .split(",").map(_.trim).collect { case measureRe(s, c, a) => (s, c, a) }.toSeq
    val skip = """(?is)AFTER\s+MATCH\s+SKIP\s+(.*?)\s*(?=PATTERN)""".r
      .findFirstMatchIn(clause).map(_.group(1).trim.toUpperCase.replaceAll("\\s+", " "))
      .map {
        case "PAST LAST ROW" => CEP.SkipPastLast
        case "TO NEXT ROW" => CEP.NoSkip
        case other => throw new IllegalArgumentException(
          s"unsupported AFTER MATCH SKIP $other (subset: PAST LAST ROW, TO NEXT ROW)")
      }
      .getOrElse(CEP.SkipPastLast) // SQL-standard default
    val patternStr = """(?is)PATTERN\s*\(\s*(.*?)\s*\)""".r
      .findFirstMatchIn(clause).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException("PATTERN required"))
    val pattern = patternStr.split("\\s+").toSeq.map {
      case symRe(s, null, _) => (s, 1, 1)
      case symRe(s, "?", _) => (s, 0, 1)
      case symRe(s, "+", _) => (s, 1, Int.MaxValue)
      case symRe(s, _, n) if n != null => (s, n.toInt, n.toInt)
      case other => throw new IllegalArgumentException(s"bad pattern element: $other")
    }
    val defineStr = """(?is)DEFINE\s+(.*)\z""".r
      .findFirstMatchIn(clause).map(_.group(1).trim).getOrElse("")
    val define = if (defineStr.isEmpty) Map.empty[String, String]
    else splitTopLevel(defineStr).map { d =>
      val m = """(?is)(\w+)\s+AS\s+(.*)""".r.findFirstMatchIn(d.trim).getOrElse(
        throw new IllegalArgumentException(s"bad DEFINE: $d"))
      m.group(1) -> m.group(2).trim
    }.toMap
    Clause(partitionBy, orderBy, measures, pattern, define, skip)
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    val cur = new StringBuilder
    s.foreach {
      case '\'' => inStr = !inStr; cur += '\''
      case '(' if !inStr => depth += 1; cur += '('
      case ')' if !inStr => depth -= 1; cur += ')'
      case ',' if depth == 0 && !inStr => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  def apply(df: DataFrame, clauseSql: String): DataFrame = {
    val c = parse(clauseSql)
    // per-symbol predicate columns; `SYM.col` refers to the row itself
    val withFlags = c.pattern.map(_._1).distinct.foldLeft(df) { (d, sym) =>
      val pred = c.define.get(sym)
        .map(p => expr(p.replaceAll(s"(?i)\\b$sym\\.", "")))
        .getOrElse(lit(true))
      d.withColumn(s"__m_$sym", pred)
    }
    val inSchema = withFlags.schema
    val symIdx = c.pattern.map(_._1).distinct
      .map(sym => sym -> inSchema.fieldIndex(s"__m_$sym")).toMap
    val keyIdx = inSchema.fieldIndex(c.partitionBy)

    val pattern = CEP.Pattern[Row](
      c.pattern.zipWithIndex.map { case ((sym, mn, mx), i) =>
        // repeated symbols get stage names sym#i; measures resolve to
        // the first stage carrying the symbol
        CEP.Stage[Row](s"$sym#$i", r => r.getBoolean(symIdx(sym)),
          if (i == 0) CEP.Relaxed else CEP.Strict, mn, mx)
      }.toVector, None, c.skip)

    val outSchema = StructType(
      inSchema(c.partitionBy) +:
        c.measures.map { case (_, colName, alias) =>
          inSchema(colName).copy(name = alias)
        })
    val stageOfSym: Map[String, String] = c.pattern.map(_._1).distinct.map { sym =>
      sym -> c.pattern.zipWithIndex.collectFirst {
        case ((s2, _, _), i) if s2 == sym => s"$sym#$i"
      }.get
    }.toMap
    val measureIdx = c.measures.map { case (sym, colName, _) =>
      (stageOfSym(sym), inSchema.fieldIndex(colName))
    }

    val rowEnc = org.apache.spark.sql.Encoders.row(outSchema)

    val sorted = withFlags
      .repartition(col(c.partitionBy))
      .sortWithinPartitions((c.partitionBy +: c.orderBy).map(col): _*)

    sorted.mapPartitions { (it: Iterator[Row]) =>
      // rows arrive key-contiguous and time-ordered: run the matcher
      // per key run, materializing only the active key's group
      // NOTE: named `in`, not `buffered` — inside the anonymous
      // Iterator subclass an outer val named `buffered` is shadowed by
      // the inherited Iterator.buffered method (self-reference!)
      val in = it.buffered
      val groups = new Iterator[(Any, Vector[Row])] {
        override def hasNext: Boolean = in.hasNext
        override def next(): (Any, Vector[Row]) = {
          val key = in.head.get(keyIdx)
          val group = Vector.newBuilder[Row]
          while (in.hasNext && in.head.get(keyIdx) == key)
            group += in.next()
          (key, group.result())
        }
      }
      groups.flatMap { case (key, rows) =>
        CEP.matchSequence(rows, pattern)(_ => 0L).map { m =>
          Row.fromSeq(key +: measureIdx.map { case (stage, idx) =>
            m.stages.get(stage).map(_.head.get(idx)).orNull
          })
        }
      }
    }(rowEnc)
  }
}
