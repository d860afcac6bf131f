package graft.cep

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Restricted SQL MATCH_RECOGNIZE (reference DataStreamMatch.scala:65,
  * runtime/match/) — the subset:
  *
  *   MATCH_RECOGNIZE (
  *     PARTITION BY <col>
  *     ORDER BY <col> [, <col>]
  *     MEASURES S.col AS alias
  *              | FIRST(S.col) | LAST(S.col) | COUNT(S.*) | COUNT(S.col)
  *              | SUM(S.col) | AVG(S.col) | MIN(S.col) | MAX(S.col) [AS alias, ...]
  *     [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *     [AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
  *      | SKIP TO [FIRST | LAST] <symbol>]
  *     PATTERN (A B+ C? D* E{n} F{n,m} B+? D*? F{n,m}? ...)
  *     [WITHIN INTERVAL 'n' SECOND|MINUTE|HOUR|DAY]
  *     DEFINE A AS <predicate on A.col>, ...
  *   )
  *
  * WITHIN bounds each match's first→last event-time span (reference
  * Pattern.within surfaced through MATCH_RECOGNIZE,
  * flink-table .../match/; requires the leading ORDER BY column to be
  * the event time — timestamp or numeric).
  *
  * AFTER MATCH defaults to SKIP PAST LAST ROW (the SQL-standard and
  * reference default, flink-table .../match/PatternVisitor); SKIP TO
  * NEXT ROW maps to the matcher's every-start mode; SKIP TO
  * FIRST/LAST <symbol> resumes at the first/last row the symbol
  * matched (reference flink-cep nfa/aftermatch/SkipToFirstStrategy
  * .java, SkipToLastStrategy.java) — overlapping pattern families.
  * Reluctant quantifiers (`B+?`, `B*?`, `B{n,m}?`) take the shortest
  * block that completes the match (Quantifier.java greedy flag).
  * Undefined pattern symbols match any row (SQL default). Execution is
  * the scalable sort-based shape: per-symbol predicates become boolean
  * columns (Catalyst expressions), rows hash-partition by the key and
  * sort within partitions, and the NFA runs streamed per key group —
  * no per-key shuffle beyond the one repartition, no group
  * materialization besides the active key's run.
  */
object MatchRecognize {

  /** A MEASURES item. Aggregates run over ALL rows the symbol matched
    * (FINAL semantics — one row per match); a bare `S.col` keeps its
    * first-row semantics. */
  sealed trait Measure { def sym: String; def colName: String; def alias: String }
  final case class ColMeasure(sym: String, colName: String, alias: String) extends Measure
  final case class AggMeasure(fn: String, sym: String, colName: String, alias: String)
      extends Measure

  /** One PATTERN element: a quantified symbol or a quantified
    * parenthesized GROUP (SQL-standard grouping, nesting allowed;
    * executes on the matcher's group stages). */
  sealed trait PatElem
  final case class PatSym(sym: String, min: Int, max: Int, rel: Boolean) extends PatElem
  final case class PatGrp(elems: Seq[PatElem], min: Int, max: Int, rel: Boolean)
      extends PatElem

  final case class Clause(
      partitionBy: String,
      orderBy: Seq[String],
      measures: Seq[Measure],
      pattern: Seq[PatElem],
      define: Map[String, String],
      skip: CEP.AfterMatchSkip,
      allRows: Boolean,
      withinUs: Option[Long])

  private val aggMeasureRe =
    """(?i)(COUNT|SUM|AVG|MIN|MAX|FIRST|LAST)\s*\(\s*(\w+)\.(\w+|\*)\s*\)\s+AS\s+(\w+)""".r
  private val measureRe = """(?i)(\w+)\.(\w+)\s+AS\s+(\w+)""".r
  private val symRe = """(\w+)(?:(\*|\+|\{(\d+)(?:,(\d+))?\})(\?)?|(\?\??))?""".r

  def parse(clause: String): Clause = {
    def section(name: String, endAt: String): Option[String] = {
      val re = s"""(?is)$name\\s+(.*?)\\s*(?=$endAt)""".r
      re.findFirstMatchIn(clause).map(_.group(1).trim)
    }
    val partitionBy = section("PARTITION BY", "ORDER BY").getOrElse(
      throw new IllegalArgumentException("PARTITION BY required"))
    val orderBy = section("ORDER BY",
      """(?:MEASURES|ONE\s+ROW|ALL\s+ROWS|AFTER\s+MATCH|PATTERN)""").getOrElse(
      throw new IllegalArgumentException("ORDER BY required"))
      .split(",").map(_.trim).toSeq
    val measures = splitTopLevel(
      section("MEASURES", """(?:ONE\s+ROW|ALL\s+ROWS|AFTER\s+MATCH|PATTERN)""").getOrElse(""))
      .map(_.trim).filter(_.nonEmpty).map {
        case aggMeasureRe(fn, sy, c, a) =>
          // `S.*` is only meaningful for COUNT; for the others it
          // would crash the executor with an opaque index error
          require(c != "*" || fn.equalsIgnoreCase("COUNT"),
            s"$fn($sy.*) is not valid — only COUNT accepts $sy.*")
          AggMeasure(fn.toUpperCase, sy, c, a)
        case measureRe(sy, c, a) => ColMeasure(sy, c, a)
        case other => throw new IllegalArgumentException(s"bad MEASURE: $other")
      }.toSeq
    val skipToRe = """(?i)TO (FIRST|LAST) (\w+)""".r
    // symbol case is preserved (only the keywords compare folded)
    val skip = """(?is)AFTER\s+MATCH\s+SKIP\s+(.*?)\s*(?=PATTERN)""".r
      .findFirstMatchIn(clause).map(_.group(1).trim.replaceAll("\\s+", " "))
      .map {
        case s0 if s0.equalsIgnoreCase("PAST LAST ROW") => CEP.SkipPastLast
        case s0 if s0.equalsIgnoreCase("TO NEXT ROW") => CEP.NoSkip
        case skipToRe(which, sym) =>
          if (which.equalsIgnoreCase("FIRST")) CEP.SkipToFirst(sym)
          else CEP.SkipToLast(sym)
        case other => throw new IllegalArgumentException(
          s"unsupported AFTER MATCH SKIP $other " +
            "(subset: PAST LAST ROW, TO NEXT ROW, TO FIRST/LAST <symbol>)")
      }
      .getOrElse(CEP.SkipPastLast) // SQL-standard default
    val allRows = """(?is)(ONE|ALL)\s+ROWS?\s+PER\s+MATCH""".r
      .findFirstMatchIn(clause).exists(_.group(1).equalsIgnoreCase("ALL"))
    // balanced-paren PATTERN body (inner groups carry their own parens)
    val pOpen = """(?is)PATTERN\s*\(""".r.findFirstMatchIn(clause).getOrElse(
      throw new IllegalArgumentException("PATTERN required")).end
    val patternStr = {
      var depth = 1
      var i = pOpen
      while (depth > 0 && i < clause.length) {
        clause.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ => ()
        }
        i += 1
      }
      require(depth == 0, "unbalanced PATTERN parentheses")
      clause.substring(pOpen, i - 1).trim
    }
    def parseSym(tok: String): PatSym = tok match {
      // symRe groups: sym, quant(*/+/{..}), n, m, reluctant-?, lone-?/??
      case symRe(s, null, _, _, _, null) => PatSym(s, 1, 1, rel = false)
      case symRe(s, null, _, _, _, "?") => PatSym(s, 0, 1, rel = false)
      // reluctant optional: try the EMPTY block first (SQL `A??`)
      case symRe(s, null, _, _, _, "??") => PatSym(s, 0, 1, rel = true)
      case symRe(s, "+", _, _, r, _) => PatSym(s, 1, Int.MaxValue, r != null)
      case symRe(s, "*", _, _, r, _) => PatSym(s, 0, Int.MaxValue, r != null)
      case symRe(s, _, n, null, r, _) if n != null => PatSym(s, n.toInt, n.toInt, r != null)
      case symRe(s, _, n, m2, r, _) if n != null && m2 != null =>
        require(n.toInt <= m2.toInt, s"bad quantifier {$n,$m2}")
        PatSym(s, n.toInt, m2.toInt, r != null)
      case other => throw new IllegalArgumentException(s"bad pattern element: $other")
    }
    def parseQuant(q: String): (Int, Int, Boolean) = {
      val rel = q.endsWith("?") && q != "?"
      val base = if (rel) q.dropRight(1) else q
      base match {
        case "" => (1, 1, false)
        // rel threads through: '(A B)??' is a RELUCTANT optional group
        // (zero repeats tried first), not a silently-greedy one
        case "?" => (0, 1, rel)
        case "+" => (1, Int.MaxValue, rel)
        case "*" => (0, Int.MaxValue, rel)
        case b =>
          val m = """\{(\d+)(?:,(\d+))?\}""".r.findFirstMatchIn(b).getOrElse(
            throw new IllegalArgumentException(s"bad group quantifier: $q"))
          val n = m.group(1).toInt
          val mx = Option(m.group(2)).map(_.toInt).getOrElse(n)
          require(n <= mx, s"bad quantifier $q")
          (n, mx, rel)
      }
    }
    // recursive descent over the (possibly nested) group structure
    def parseElems(str: String): Seq[PatElem] = {
      val out = Seq.newBuilder[PatElem]
      var i = 0
      def tokenEnd(from: Int): Int = {
        var k = from
        while (k < str.length && !str.charAt(k).isWhitespace && str.charAt(k) != '(')
          k += 1
        k
      }
      while (i < str.length) {
        if (str.charAt(i).isWhitespace) i += 1
        else if (str.charAt(i) == '(') {
          var depth = 1
          var j = i + 1
          while (depth > 0 && j < str.length) {
            str.charAt(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ => ()
            }
            j += 1
          }
          require(depth == 0, s"unbalanced group parentheses in: $str")
          val inner = str.substring(i + 1, j - 1)
          val qEnd = tokenEnd(j)
          val (mn, mx, rel) = parseQuant(str.substring(j, qEnd))
          out += PatGrp(parseElems(inner), mn, mx, rel)
          i = qEnd
        } else {
          val end = tokenEnd(i)
          out += parseSym(str.substring(i, end))
          i = end
        }
      }
      out.result()
    }
    val pattern: Seq[PatElem] = parseElems(patternStr)
    val withinUs = """(?is)WITHIN\s+INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?""".r
      .findFirstMatchIn(clause).map { m =>
        m.group(1).toLong * (m.group(2).toUpperCase match {
          case "SECOND" => 1000000L
          case "MINUTE" => 60000000L
          case "HOUR" => 3600000000L
          case "DAY" => 86400000000L
        })
      }
    val defineStr = """(?is)DEFINE\s+(.*)\z""".r
      .findFirstMatchIn(clause).map(_.group(1).trim).getOrElse("")
    val define = if (defineStr.isEmpty) Map.empty[String, String]
    else splitTopLevel(defineStr).map { d =>
      val m = """(?is)(\w+)\s+AS\s+(.*)""".r.findFirstMatchIn(d.trim).getOrElse(
        throw new IllegalArgumentException(s"bad DEFINE: $d"))
      m.group(1) -> m.group(2).trim
    }.toMap
    Clause(partitionBy, orderBy, measures, pattern, define, skip, allRows, withinUs)
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

  /** Every symbol occurrence in pattern order (groups flattened,
    * recursively). */
  private def allSyms(c: Clause): Seq[String] = {
    def walk(es: Seq[PatElem]): Seq[String] = es.flatMap {
      case PatSym(s, _, _, _) => Seq(s)
      case PatGrp(inner, _, _, _) => walk(inner)
    }
    walk(c.pattern)
  }

  /** (symbol, stage name) per occurrence, in traversal order — the
    * single source of truth for stage naming, shared by the stage
    * builder and the measure evaluator. */
  private def symStages(c: Clause): Seq[(String, String)] = {
    var n = -1
    def nm(sym: String): (String, String) = { n += 1; sym -> s"$sym#$n" }
    def walk(es: Seq[PatElem]): Seq[(String, String)] = es.flatMap {
      case PatSym(s, _, _, _) => Seq(nm(s))
      case PatGrp(inner, _, _, _) => walk(inner)
    }
    walk(c.pattern)
  }

  /** Per-symbol predicate columns; `SYM.col` refers to the row itself. */
  private def addFlags(df: DataFrame, c: Clause): DataFrame =
    allSyms(c).distinct.foldLeft(df) { (d, sym) =>
      val pred = c.define.get(sym)
        .map(p => expr(p.replaceAll(s"(?i)\\b$sym\\.", "")))
        .getOrElse(lit(true))
      d.withColumn(s"__m_$sym", pred)
    }

  /** Repeated symbols get stage names sym#i; measures resolve across
    * every stage carrying the symbol. SQL groups compile to matcher
    * group stages with ALL-STRICT inner contiguity — the standard's
    * consecutive-rows semantics, back-to-back between repeats. */
  private def stagesOf(c: Clause, symIdx: Map[String, Int]): Vector[CEP.Stage[Row]] = {
    val names = symStages(c).iterator
    var gn = -1
    def build(es: Seq[PatElem], topLevel: Boolean): Vector[CEP.Stage[Row]] =
      es.zipWithIndex.map {
        case (PatSym(sym, mn, mx, rel), i) =>
          CEP.Stage[Row](names.next()._2, r => r.getBoolean(symIdx(sym)),
            if (topLevel && i == 0) CEP.Relaxed else CEP.Strict, mn, mx,
            reluctant = rel)
        case (PatGrp(inner, mn, mx, rel), i) =>
          val sub = build(inner, topLevel = false)
          gn += 1
          CEP.Stage[Row](s"group#$gn", _ => true,
            if (topLevel && i == 0) CEP.Relaxed else CEP.Strict, mn, mx,
            reluctant = rel, group = Some(sub))
      }.toVector
    build(c.pattern, topLevel = true)
  }

  def apply(df: DataFrame, clauseSql: String): DataFrame = {
    val c = parse(clauseSql)
    val withFlags = addFlags(df, c)
    val inSchema = withFlags.schema
    val symIdx = allSyms(c).distinct
      .map(sym => sym -> inSchema.fieldIndex(s"__m_$sym")).toMap
    val keyIdx = inSchema.fieldIndex(c.partitionBy)

    val pattern = CEP.Pattern[Row](stagesOf(c, symIdx), c.withinUs, c.skip)

    // WITHIN needs real event times: micros from the leading ORDER BY
    // column (without WITHIN a constant keeps the matcher span-free)
    val tsOf: Row => Long = c.withinUs match {
      case None => _ => 0L
      case Some(_) =>
        import org.apache.spark.sql.types._
        val tsIdx = inSchema.fieldIndex(c.orderBy.head)
        inSchema(tsIdx).dataType match {
          case TimestampType | TimestampNTZType => r => {
            val t = r.getAs[java.sql.Timestamp](tsIdx)
            t.getTime * 1000L + (t.getNanos / 1000) % 1000L
          }
          case LongType => r => r.getLong(tsIdx)
          case IntegerType => r => r.getInt(tsIdx).toLong
          case other => throw new IllegalArgumentException(
            s"WITHIN needs a timestamp or numeric leading ORDER BY column, got $other")
        }
    }

    val meas = new Measures(c, inSchema)
    val outSchema = meas.outSchema

    // ALL ROWS PER MATCH: input rows + CLASSIFIER() + MATCH_NUMBER()
    // (restricted: MEASURES are the ONE-ROW form's output — reject the
    // combination instead of silently ignoring one of them)
    if (c.allRows) require(c.measures.isEmpty,
      "ALL ROWS PER MATCH subset emits input rows + classifier + match_num; drop MEASURES")
    val baseFields = inSchema.fields.filterNot(_.name.startsWith("__m_")).toSeq
    val allRowsSchema = StructType(baseFields :+
      StructField("classifier", org.apache.spark.sql.types.StringType, nullable = false) :+
      StructField("match_num", org.apache.spark.sql.types.LongType, nullable = false))
    val baseIdx = baseFields.map(f => inSchema.fieldIndex(f.name))
    val stageNamesInOrder = symStages(c).map(_._2)
    // ALL ROWS emits each match's rows in TEMPORAL order (the ORDER BY
    // key) — with repeated groups the symbols interleave, so
    // stage-ordered emission would reorder rows within the match
    val obIdx = c.orderBy.map(inSchema.fieldIndex)
    val rowOrd: Ordering[Row] = (x: Row, y: Row) => {
      var r = 0
      val it = obIdx.iterator
      while (r == 0 && it.hasNext) {
        val i = it.next()
        val (a, b) = (x.get(i), y.get(i))
        r = if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else a.asInstanceOf[Comparable[Any]].compareTo(b)
      }
      r
    }

    val rowEnc = org.apache.spark.sql.Encoders.row(
      if (c.allRows) allRowsSchema else outSchema)

    val sorted = withFlags
      .repartition(col(c.partitionBy))
      .sortWithinPartitions((c.partitionBy +: c.orderBy).map(col): _*)

    sorted.mapPartitions { (it: Iterator[Row]) =>
      // rows arrive key-contiguous and time-ordered: run the matcher
      // per key run. With WITHIN the per-key buffer is bounded by the
      // span (matchSequenceBounded — the streaming path's sealing
      // discipline), so a hot key with millions of rows never
      // materializes; without WITHIN the full run is semantic state.
      // NOTE: named `in`, not `buffered` — inside the anonymous
      // Iterator subclass an outer val named `buffered` is shadowed by
      // the inherited Iterator.buffered method (self-reference!)
      val in = it.buffered
      val groups = new Iterator[(Any, Iterator[Row])] {
        override def hasNext: Boolean = in.hasNext
        override def next(): (Any, Iterator[Row]) = {
          val key = in.head.get(keyIdx)
          (key, new Iterator[Row] {
            // consumed fully (via flatMap) before the next group starts
            override def hasNext: Boolean = in.hasNext && in.head.get(keyIdx) == key
            override def next(): Row = in.next()
          })
        }
      }
      groups.flatMap { case (key, rows) =>
        val ms: Iterator[CEP.Match[Row]] =
          if (c.withinUs.isDefined) CEP.matchSequenceBounded(rows, pattern)(tsOf)
          else CEP.matchSequence(rows.toIndexedSeq, pattern)(tsOf).iterator
        if (c.allRows)
          // MATCH_NUMBER() is per partition, in match order; each
          // match's rows sort by the ORDER BY key (grouped patterns
          // interleave symbols, so stage order alone is not temporal)
          ms.zipWithIndex.flatMap { case (m, mi) =>
            stageNamesInOrder.iterator.flatMap { st =>
              m.stages.getOrElse(st, Nil).map(r => (st, r))
            }.toSeq.sortBy(_._2)(rowOrd).iterator.map { case (st, r) =>
              Row.fromSeq(baseIdx.map(r.get) :+
                st.takeWhile(_ != '#') :+ (mi + 1).toLong)
            }
          }
        else ms.map { m =>
          Row.fromSeq(key +: meas.eval(m))
        }
      }
    }(rowEnc)
  }

  /** Measure evaluation shared by the batch and streaming forms. */
  private final class Measures(c: Clause, inSchema: StructType) extends Serializable {
    import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, LongType}
    private def isFractional(dt: DataType) = dt == DoubleType || dt == FloatType

    val outSchema: StructType = StructType(
      inSchema(c.partitionBy) +:
        c.measures.map {
          case ColMeasure(_, colName, alias) => inSchema(colName).copy(name = alias)
          case AggMeasure("COUNT", _, _, alias) => StructField(alias, LongType, nullable = false)
          case AggMeasure("AVG", _, colName, alias) => StructField(alias, DoubleType, nullable = true)
          case AggMeasure("SUM", _, colName, alias) =>
            StructField(alias,
              if (isFractional(inSchema(colName).dataType)) DoubleType else LongType,
              nullable = true)
          case AggMeasure(_, _, colName, alias) => // MIN/MAX/FIRST/LAST keep the type
            inSchema(colName).copy(name = alias)
        })

    // all stages carrying a symbol, in pattern order — SQL classifiers
    // repeated in the pattern (or inside groups) are ONE symbol, so
    // measures span them all
    private val stagesOfSym: Map[String, Seq[String]] =
      symStages(c).groupBy(_._1).map { case (sym, es) => sym -> es.map(_._2) }
    private val plan: Seq[(Measure, Int, Boolean)] = c.measures.map { m =>
      val idx = if (m.colName == "*") -1 else inSchema.fieldIndex(m.colName)
      val frac = m.colName != "*" && isFractional(inSchema(m.colName).dataType)
      (m, idx, frac)
    }

    def eval(mm: CEP.Match[Row]): Seq[Any] = plan.map(evalOne(mm, _))

    private def evalOne(mm: CEP.Match[Row], p: (Measure, Int, Boolean)): Any = {
      val (meas, idx, frac) = p
      val rows = stagesOfSym(meas.sym).flatMap(st => mm.stages.getOrElse(st, Nil))
      def vals = rows.iterator.map(_.get(idx)).filter(_ != null).toSeq
      meas match {
        case ColMeasure(_, _, _) => rows.headOption.map(_.get(idx)).orNull
        case AggMeasure("COUNT", _, "*", _) => rows.size.toLong
        case AggMeasure("COUNT", _, _, _) => vals.size.toLong
        case AggMeasure("FIRST", _, _, _) => rows.headOption.map(_.get(idx)).orNull
        case AggMeasure("LAST", _, _, _) => rows.lastOption.map(_.get(idx)).orNull
        case AggMeasure("SUM", _, _, _) =>
          val vs = vals
          if (vs.isEmpty) null
          else if (frac) vs.map(_.asInstanceOf[Number].doubleValue).sum
          else vs.map(_.asInstanceOf[Number].longValue).sum
        case AggMeasure("AVG", _, _, _) =>
          val vs = vals
          if (vs.isEmpty) null
          else vs.map(_.asInstanceOf[Number].doubleValue).sum / vs.size
        case AggMeasure(fn @ ("MIN" | "MAX"), _, _, _) =>
          val vs = vals
          if (vs.isEmpty) null
          else {
            val cmp = (a: Any, b: Any) =>
              a.asInstanceOf[Comparable[Any]].compareTo(b) <= 0
            vs.reduce((a, b) => if (cmp(a, b) == (fn == "MIN")) a else b)
          }
        case AggMeasure(fn, _, _, _) =>
          throw new IllegalArgumentException(s"unsupported measure function $fn")
      }
    }
  }

  /** The STREAMING form (the reference's MATCH_RECOGNIZE is
    * streaming-first — DataStreamMatch translates onto the CEP
    * operator): the same restricted clause over a WATERMARKED
    * streaming frame, executed on [[CEP.patternStream]] — per-key
    * buffer in GroupState, matches emitted exactly once their start
    * row seals, state bounded by the WITHIN span (which is therefore
    * required, as is a bigint partition key and the ONE ROW form).
    * Compose with a memory/file sink downstream. */
  def stream(df: DataFrame, clauseSql: String): DataFrame = {
    val c = parse(clauseSql)
    require(c.withinUs.isDefined,
      "streaming MATCH_RECOGNIZE requires WITHIN — unbounded patterns cannot seal")
    require(!c.allRows,
      "streaming MATCH_RECOGNIZE subset emits the ONE ROW PER MATCH form")
    val withFlags = addFlags(df, c)
    val inSchema = withFlags.schema
    val symIdx = allSyms(c).distinct
      .map(sym => sym -> inSchema.fieldIndex(s"__m_$sym")).toMap
    val keyIdx = inSchema.fieldIndex(c.partitionBy)
    require(inSchema(keyIdx).dataType == org.apache.spark.sql.types.LongType,
      "streaming MATCH_RECOGNIZE requires a BIGINT partition key")
    val tsIdx = inSchema.fieldIndex(c.orderBy.head)
    // fail at compile time, not with an executor ClassCastException: the
    // leading ORDER BY column is compared to the WATERMARK, so unlike the
    // batch form (which also takes numerics) it must be a real timestamp
    require(inSchema(tsIdx).dataType == org.apache.spark.sql.types.TimestampType,
      "streaming MATCH_RECOGNIZE requires a TIMESTAMP leading ORDER BY " +
        s"column (it is compared to the watermark); got " +
        s"${inSchema(tsIdx).dataType.simpleString} for '${c.orderBy.head}'")
    val tieIdx = c.orderBy.drop(1).headOption.map(inSchema.fieldIndex)
    // patternStream works in epoch millis (watermark comparisons)
    val pattern = CEP.Pattern[Row](stagesOf(c, symIdx),
      c.withinUs.map(_ / 1000L), c.skip)
    val meas = new Measures(c, inSchema)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.Encoders.row(meas.outSchema)
    implicit val keyEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    implicit val bufEnc: org.apache.spark.sql.Encoder[Seq[Row]] =
      org.apache.spark.sql.Encoders.kryo[Seq[Row]]
    CEP.patternStream[Row, Long, Row](withFlags, pattern,
      r => r.getAs[Number](keyIdx).longValue,
      r => r.getAs[java.sql.Timestamp](tsIdx).getTime,
      r => tieIdx.map(i => r.getAs[Number](i).longValue).getOrElse(0L)) {
      (k, m) => Row.fromSeq(k +: meas.eval(m))
    }.toDF()
  }
}
