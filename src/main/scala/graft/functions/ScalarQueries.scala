package graft.functions

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** SQL scalar function surface (SURVEY.md §2.11) — one query per
  * category, each exercising the Spark equivalents of the reference's
  * expression classes (flink-table-planner/.../expressions/
  * stringExpressions.scala, mathExpressions.scala, time.scala,
  * hashExpressions.scala, logic.scala, comparison.scala).
  *
  * Oracle parity notes: trig results are rounded to 10 dp (libm ulp
  * differences), DuckDB's bigint-returning extracts are cast to INT,
  * and DuckDB-absent functions (initcap, overlay) are expressed
  * compositionally in the oracle — an independent formulation.
  */
object ScalarQueries extends QueryModule {

  private def r10(c: Column) = round(c, 10)

  /** q31's PRE-ROUND float columns, keyed by output name — one
    * definition shared by the query (which rounds each at 10 dp) and
    * quantMargins (which measures each one's distance to the round
    * boundary), the q210 psiWithP pattern. sqrt IS IEEE-correctly-
    * rounded and degrees/radians are single multiplies, but they stay
    * in the measured set: DuckDB may compute them with a different op
    * sequence (e.g. x·180/π as two ops), so the boundary margin is
    * the honest cross-engine statement for every one of them. */
  private val q31FloatRaws: Map[String, Column] = {
    val sz10 = col("p_size") / 10.0
    Map(
      "pow2" -> pow(col("p_size"), 2),
      "sqrtv" -> sqrt(col("p_retailprice")),
      "expv" -> exp(col("p_size") / 100.0),
      "lnv" -> log(col("p_retailprice")),
      "log10v" -> log10(col("p_retailprice")),
      "log2v" -> log2(col("p_retailprice")),
      "sinv" -> sin(sz10),
      "cosv" -> cos(sz10),
      "tanv" -> tan(sz10),
      "sinhv" -> sinh(col("p_size") / 50.0),
      "coshv" -> cosh(col("p_size") / 50.0),
      "tanhv" -> tanh(col("p_size") / 50.0),
      "asinv" -> asin(col("p_size") / 50.0),
      "acosv" -> acos(col("p_size") / 50.0),
      "atanv" -> atan(sz10),
      "atan2v" -> atan2(col("p_size").cast("double"), lit(7.0)),
      "degv" -> degrees(sz10),
      "radv" -> radians(col("p_size").cast("double")),
      "cotv" -> lit(1.0) / tan(sz10 + 1.0),
      "cbrtv" -> cbrt(col("p_retailprice")))
  }

  /** Sweep-time round(·, 10) boundary margin for q31 (r13 verdict
    * item 5): min distance of 1e10·raw to the nearest half-integer
    * across ALL float columns — q31's rounding is 10 dp, so the flip
    * zone is 1e10-scaled (tighter than the pipeline's 1e6 surfaces;
    * the part table is tiny, so measuring all 20 columns in one agg
    * is free). */
  private[graft] def quantMargins(
      s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, Double)] = {
    val part = Tables.t(s, dir, "part")
    val margins = q31FloatRaws.values.toSeq.map { raw =>
      val y = lit(1.0e10) * raw
      min(abs(abs(y - floor(y)) - lit(0.5)))
    }
    val row = part.agg(margins.head, margins.tail: _*).collect()(0)
    Seq("q31_round10_half" ->
      (0 until margins.size).map(row.getDouble).min)
  }

  override def queries: Seq[QueryDef] = Seq(

    // ----- string functions (stringExpressions.scala:34-558) -----
    q("q30_string_funcs",
      """SELECT p_partkey,
        |  CAST(length(p_name) AS INTEGER) AS len,
        |  upper(p_name) AS up, lower(p_name) AS lo,
        |  substring(p_name, 3, 5) AS sub,
        |  trim(concat('  ', p_name, '  ')) AS trimmed,
        |  ltrim(concat('xx', p_name), 'x') AS ltrimmed,
        |  rtrim(concat(p_name, 'xx'), 'x') AS rtrimmed,
        |  lpad(p_brand, 12, '*') AS lpadded,
        |  rpad(p_brand, 12, '*') AS rpadded,
        |  CAST(strpos(p_name, 'a') AS INTEGER) AS pos_a,
        |  replace(p_type, 'ECONOMY', 'eco') AS repl,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS re_repl,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS re_ext,
        |  repeat(substring(p_brand, 1, 2), 3) AS repeated,
        |  reverse(p_name) AS rev,
        |  concat_ws('-', p_brand, p_type) AS joined,
        |  substring(p_name, 1, 2) || 'XX' || substring(p_name, 5) AS overlaid,
        |  left(p_name, 4) AS l4, right(p_name, 3) AS r3,
        |  translate(p_type, 'AEO', 'aeo') AS transl,
        |  CAST(ascii(p_name) AS INTEGER) AS asc_first,
        |  p_name LIKE '%er%' AS has_er,
        |  regexp_matches(p_name, 'er|or') AS re_like,
        |  string_split(p_type, ' ')[1] AS first_word,
        |  upper(substring(p_brand, 1, 1)) || lower(substring(p_brand, 2)) AS initcapped,
        |  md5(p_name) AS h_md5,
        |  sha256(p_name) AS h_sha256
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      Tables.t(s, dir, "part").select(
        col("p_partkey"),
        length(col("p_name")).as("len"),
        upper(col("p_name")).as("up"), lower(col("p_name")).as("lo"),
        substring(col("p_name"), 3, 5).as("sub"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        ltrim(concat(lit("xx"), col("p_name")), "x").as("ltrimmed"),
        rtrim(concat(col("p_name"), lit("xx")), "x").as("rtrimmed"),
        lpad(col("p_brand"), 12, "*").as("lpadded"),
        rpad(col("p_brand"), 12, "*").as("rpadded"),
        locate("a", col("p_name")).as("pos_a"),
        regexp_replace(col("p_type"), "ECONOMY", "eco").as("repl"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("re_repl"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("re_ext"),
        repeat(substring(col("p_brand"), 1, 2), 3).as("repeated"),
        reverse(col("p_name")).as("rev"),
        concat_ws("-", col("p_brand"), col("p_type")).as("joined"),
        overlay(col("p_name"), lit("XX"), lit(3)).as("overlaid"),
        substring(col("p_name"), 1, 4).as("l4"),
        expr("right(p_name, 3)").as("r3"),
        translate(col("p_type"), "AEO", "aeo").as("transl"),
        ascii(col("p_name")).as("asc_first"),
        col("p_name").like("%er%").as("has_er"),
        col("p_name").rlike("er|or").as("re_like"),
        split(col("p_type"), " ").getItem(0).as("first_word"),
        initcap(col("p_brand")).as("initcapped"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha256"))
        .orderBy(col("p_partkey"))
    },

    // ----- math functions (mathExpressions.scala:31-497) -----
    q("q31_math_funcs",
      """SELECT p_partkey,
        |  abs(p_retailprice - 1000) AS absv,
        |  ceil(p_retailprice) AS ceilv, floor(p_retailprice) AS floorv,
        |  round(p_retailprice, 1) AS round1,
        |  CAST(sign(p_retailprice - 1000) AS DOUBLE) AS signv,
        |  round(power(p_size, 2), 10) AS pow2,
        |  round(sqrt(p_retailprice), 10) AS sqrtv,
        |  round(exp(p_size / 100.0), 10) AS expv,
        |  round(ln(p_retailprice), 10) AS lnv,
        |  round(log10(p_retailprice), 10) AS log10v,
        |  round(log2(p_retailprice), 10) AS log2v,
        |  round(sin(p_size / 10.0), 10) AS sinv,
        |  round(cos(p_size / 10.0), 10) AS cosv,
        |  round(tan(p_size / 10.0), 10) AS tanv,
        |  round((exp(p_size / 50.0) - exp(-(p_size / 50.0))) / 2, 10) AS sinhv,
        |  round((exp(p_size / 50.0) + exp(-(p_size / 50.0))) / 2, 10) AS coshv,
        |  round((exp(2 * (p_size / 50.0)) - 1) / (exp(2 * (p_size / 50.0)) + 1), 10) AS tanhv,
        |  round(asin(p_size / 50.0), 10) AS asinv,
        |  round(acos(p_size / 50.0), 10) AS acosv,
        |  round(atan(p_size / 10.0), 10) AS atanv,
        |  round(atan2(p_size, 7), 10) AS atan2v,
        |  round(degrees(p_size / 10.0), 10) AS degv,
        |  round(radians(CAST(p_size AS DOUBLE)), 10) AS radv,
        |  round(1.0 / tan(p_size / 10.0 + 1.0), 10) AS cotv,
        |  round(cbrt(p_retailprice), 10) AS cbrtv,
        |  CAST(p_size % 7 AS INTEGER) AS modv,
        |  greatest(p_size, 25) AS biggest, least(p_size, 25) AS smallest,
        |  round(pi(), 10) AS piv,
        |  bin(p_size) AS binv
        |FROM part ORDER BY p_partkey""") { (s, dir) =>
      val sz10 = col("p_size") / 10.0
      Tables.t(s, dir, "part").select(
        col("p_partkey"),
        abs(col("p_retailprice") - 1000).as("absv"),
        ceil(col("p_retailprice")).cast("double").as("ceilv"),
        floor(col("p_retailprice")).cast("double").as("floorv"),
        round(col("p_retailprice"), 1).as("round1"),
        signum(col("p_retailprice") - 1000).as("signv"),
        r10(q31FloatRaws("pow2")).as("pow2"),
        r10(q31FloatRaws("sqrtv")).as("sqrtv"),
        r10(q31FloatRaws("expv")).as("expv"),
        r10(q31FloatRaws("lnv")).as("lnv"),
        r10(q31FloatRaws("log10v")).as("log10v"),
        r10(q31FloatRaws("log2v")).as("log2v"),
        r10(q31FloatRaws("sinv")).as("sinv"),
        r10(q31FloatRaws("cosv")).as("cosv"),
        r10(q31FloatRaws("tanv")).as("tanv"),
        r10(q31FloatRaws("sinhv")).as("sinhv"),
        r10(q31FloatRaws("coshv")).as("coshv"),
        r10(q31FloatRaws("tanhv")).as("tanhv"),
        r10(q31FloatRaws("asinv")).as("asinv"),
        r10(q31FloatRaws("acosv")).as("acosv"),
        r10(q31FloatRaws("atanv")).as("atanv"),
        r10(q31FloatRaws("atan2v")).as("atan2v"),
        r10(q31FloatRaws("degv")).as("degv"),
        r10(q31FloatRaws("radv")).as("radv"),
        r10(q31FloatRaws("cotv")).as("cotv"),
        r10(q31FloatRaws("cbrtv")).as("cbrtv"),
        (col("p_size") % 7).cast("int").as("modv"),
        greatest(col("p_size"), lit(25)).as("biggest"),
        least(col("p_size"), lit(25)).as("smallest"),
        r10(lit(math.Pi)).as("piv"),
        bin(col("p_size")).as("binv"))
        .orderBy(col("p_partkey"))
    },

    // ----- temporal functions (time.scala:36-344) -----
    q("q32_temporal_funcs",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS mo,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
        |  CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  CAST(o_orderdate AS DATE) - 7 AS minus7,
        |  CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INTEGER) AS days_since,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        |  strftime(o_orderdate, '%d/%m/%Y %H:%M:%S') AS fmt2
        |FROM orders ORDER BY o_orderkey""") { (s, dir) =>
      Tables.t(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("qtr"),
        dayofyear(col("o_orderdate")).as("doy"),
        dayofweek(col("o_orderdate")).as("dow"),
        weekofyear(col("o_orderdate")).as("woy"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_trunc("quarter", col("o_orderdate")).as("q_start"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        date_sub(col("o_orderdate").cast("date"), 7).as("minus7"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("timestamp")).as("days_since"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
        date_format(col("o_orderdate"), "dd/MM/yyyy HH:mm:ss").as("fmt2"))
        .orderBy(col("o_orderkey"))
    },

    // ----- conditional / comparison / null handling (logic.scala,
    // comparison.scala) -----
    q("q33_conditional",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'neg'
        |       WHEN c_acctbal < 5000 THEN 'mid'
        |       ELSE 'high' END AS bal_class,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
        |  c_acctbal BETWEEN 0 AND 1000 AS in_band,
        |  c_mktsegment IN ('MACHINERY', 'HOUSEHOLD') AS seg_in,
        |  nullif(c_nationkey, 3) IS NULL AS was3,
        |  NOT (c_acctbal > 0) AS non_positive,
        |  (c_acctbal > 0 AND c_nationkey < 10) OR c_mktsegment = 'AUTOMOBILE' AS mixed_logic,
        |  if(c_acctbal >= 0, 'credit', 'debit') AS side
        |FROM customer ORDER BY c_custkey""") { (s, dir) =>
      Tables.t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 5000, "mid")
          .otherwise("high").as("bal_class"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_masked"),
        col("c_acctbal").between(0, 1000).as("in_band"),
        col("c_mktsegment").isin("MACHINERY", "HOUSEHOLD").as("seg_in"),
        nullif(col("c_nationkey"), lit(3)).isNull.as("was3"),
        (!(col("c_acctbal") > 0)).as("non_positive"),
        ((col("c_acctbal") > 0 && col("c_nationkey") < 10) || col("c_mktsegment") === "AUTOMOBILE").as("mixed_logic"),
        when(col("c_acctbal") >= 0, "credit").otherwise("debit").as("side"))
        .orderBy(col("c_custkey"))
    },

    // ----- collections (collection.scala:33-184): array/map build +
    // access, cardinality; surfaced as scalars for oracle portability -----
    q("q34_collections",
      """SELECT n_nationkey,
        |  CAST(len(string_split(n_name, 'A')) AS INTEGER) AS n_parts,
        |  string_split(n_name, 'A')[1] AS head_part,
        |  string_split(n_name, 'A')[-1] AS last_part,
        |  array_to_string([n_name, 'x', CAST(n_regionkey AS VARCHAR)], '|') AS packed,
        |  CAST(n_regionkey IN (0, 2, 4) AS BOOLEAN) AS in_arr,
        |  list_contains(string_split(n_name, 'A'), 'N') AS has_n
        |FROM nation ORDER BY n_nationkey""") { (s, dir) =>
      val parts = split(col("n_name"), "A")
      Tables.t(s, dir, "nation").select(
        col("n_nationkey"),
        size(parts).as("n_parts"),
        parts.getItem(0).as("head_part"),
        element_at(parts, -1).as("last_part"),
        array_join(array(col("n_name"), lit("x"), col("n_regionkey").cast("string")), "|").as("packed"),
        array_contains(array(lit(0), lit(2), lit(4)), col("n_regionkey")).as("in_arr"),
        array_contains(parts, "N").as("has_n"))
        .orderBy(col("n_nationkey"))
    },

    // ----- retractable UDAGG consuming a changelog (the reference's
    // AggregateFunction.retract path, GroupAggProcessFunction): every
    // lineitem row accumulates and every R-returnflag row ALSO
    // retracts, so the net aggregate equals the non-R subset — which
    // is what the oracle computes directly. max must survive its
    // current extremum retracting (value->count multiset state, the
    // reference's retractable-min/max MapState), so a plain running
    // max would fail this oracle. One shuffle; partial aggregation
    // stays available because (flag, value) reduction is commutative. -----
    q("q130_retractable_agg",
      """SELECT l_linestatus,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  count(*) AS n,
        |  max(l_quantity) AS max_qty
        |FROM lineitem WHERE l_returnflag <> 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""") { (s, dir) =>
      val li = Tables.t(s, dir, "lineitem")
        .select(col("l_linestatus"), col("l_returnflag"), col("l_quantity"))
      val changelog = li.withColumn("accumulate", lit(true))
        .unionByName(li.filter(col("l_returnflag") === "R")
          .withColumn("accumulate", lit(false)))
      changelog.groupBy(col("l_linestatus"))
        .agg(
          RetractableAgg.retractableSum(col("accumulate"), col("l_quantity")).as("sum_qty"),
          RetractableAgg.retractableCount(col("accumulate"), col("l_quantity")).as("n"),
          RetractableAgg.retractableMax(col("accumulate"), col("l_quantity")).as("max_qty"))
        .orderBy(col("l_linestatus"))
    }
  )
}
