package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Batch relational operator coverage (SURVEY.md §2.3-§2.8).
  *
  * Mirrors the reference's DataSet/Table relational surface —
  * joins (flink-java/.../DataSet.java:751-1118), aggregations
  * (DataSet.java:339-727, plan/nodes/dataset/DataSetAggregate.scala),
  * set ops (table.scala:838-967), sort/limit (DataSetSort.scala:82-140)
  * — re-expressed as declarative Spark plans so Catalyst/Tungsten pick
  * physical strategies (broadcast vs shuffle join, partial aggs).
  *
  * Determinism rules used throughout:
  *  - money math is done in DecimalType(18,4) so sums are exact and
  *    independent of partition/summation order (100 TB safe);
  *  - double aggregates (avg/stddev) are rounded to 6 dp;
  *  - every result has a total ORDER BY with unique tie-breakers.
  */
object RelationalQueries extends QueryModule {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))
  private val DEC = "decimal(18,4)"

  override def queries: Seq[QueryDef] = Seq(

    // ----- §2.5 full-scan aggregation (TPC-H Q1 analog; reference
    // DataSetAggregate.scala partial+final agg — Catalyst does the
    // partial/final split automatically) -----
    q("q01_pricing_summary",
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(round(sum(CAST(l_quantity AS $DEC)), 4) AS DOUBLE) AS sum_qty,
         |  CAST(round(sum(CAST(l_extendedprice AS $DEC)), 4) AS DOUBLE) AS sum_base_price,
         |  CAST(round(sum(CAST(l_extendedprice AS $DEC) * CAST(1 - l_discount AS $DEC)), 4) AS DOUBLE) AS sum_disc_price,
         |  CAST(round(sum(CAST(l_extendedprice AS $DEC) * CAST((1 - l_discount) * (1 + l_tax) AS decimal(18,8)) ), 4) AS DOUBLE) AS sum_charge,
         |  round(avg(l_quantity), 6) AS avg_qty,
         |  round(avg(l_extendedprice), 6) AS avg_price,
         |  round(avg(l_discount), 6) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""") { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneyOut(sum(dec(col("l_quantity")))).as("sum_qty"),
          moneyOut(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
          moneyOut(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))).as("sum_disc_price"),
          moneyOut(sum(dec(col("l_extendedprice")) * ((lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).cast(DecimalType(18, 8)))).as("sum_charge"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_extendedprice")), 6).as("avg_price"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // ----- §2.4 three-way join + agg + top-k (TPC-H Q3 analog,
    // mirroring reference example TPCHQuery3.java:186-302). customer
    // and orders are the small sides; Catalyst broadcasts them. -----
    q("q02_shipping_priority",
      s"""SELECT l_orderkey,
         |  CAST(round(sum(CAST(l_extendedprice AS $DEC) * CAST(1 - l_discount AS $DEC)), 4) AS DOUBLE) AS revenue,
         |  o_orderdate
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey
         |LIMIT 10""") { (s, dir) =>
      val cust = Tables.t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = Tables.t(s, dir, "lineitem")
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(moneyOut(sum(dec(col("l_extendedprice")) * dec(lit(1) - col("l_discount")))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // ----- §2.4 inner equi-join (DataSet.java:751 join) -----
    q("q03_join_inner",
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""") { (s, dir) =>
      Tables.t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .join(Tables.t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("o_orderkey"))
    },

    // ----- §2.4 left outer join (DataSet.java:841); filtered right
    // side guarantees NULL rows exist -----
    q("q04_join_left_outer",
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) big
        |  ON c_custkey = big.o_custkey
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""") { (s, dir) =>
      val big = Tables.t(s, dir, "orders").filter(col("o_totalprice") > 300000)
      Tables.t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    // ----- §2.4 full outer join (DataSet.java:966) over pre-aggregated
    // sides (customers vs suppliers per nation, each side filtered so
    // both null sides occur) -----
    q("q05_join_full_outer",
      """SELECT coalesce(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
        |      WHERE c_acctbal > 0 GROUP BY c_nationkey) c
        |FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
        |      GROUP BY s_nationkey) s
        |  ON c.nk = s.nk
        |ORDER BY nationkey""") { (s, dir) =>
      val c = Tables.t(s, dir, "customer").filter(col("c_acctbal") > 0)
        .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("n_cust"))
      val sp = Tables.t(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_supp"))
      c.join(sp, col("cnk") === col("snk"), "full")
        .select(coalesce(col("cnk"), col("snk")).as("nationkey"), col("n_cust"), col("n_supp"))
        .orderBy(col("nationkey"))
    },

    // ----- §2.4 semi join (SQL IN/EXISTS → left_semi; reference
    // FlinkRuleSets.scala:36-39 subquery decorrelation) -----
    q("q06_join_semi",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""") { (s, dir) =>
      val big = Tables.t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      Tables.t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ----- §2.4 anti join (NOT EXISTS → left_anti) -----
    q("q07_join_anti",
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        |ORDER BY c_custkey""") { (s, dir) =>
      val big = Tables.t(s, dir, "orders").filter(col("o_totalprice") > 400000)
      Tables.t(s, dir, "customer")
        .join(big, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // ----- §2.4 cross join (DataSet.java:1056 cross/crossWithTiny —
    // both sides tiny, so broadcast nested loop) -----
    q("q08_cross_join",
      """SELECT r_name, n_name
        |FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""") { (s, dir) =>
      Tables.t(s, dir, "region").crossJoin(broadcast(Tables.t(s, dir, "nation")))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // ----- §2.4 coGroup (DataSet.java:1009, CoGroupOperator.java) via
    // the typed KeyValueGroupedDataset.cogroup — per-key iterables from
    // both sides in one function, the general form subsuming joins -----
    q("q09_cogroup",
      """SELECT coalesce(c.k, o.k) AS custkey, coalesce(c.n, 0) AS n_cust, coalesce(o.n, 0) AS n_orders
        |FROM (SELECT c_custkey AS k, count(*) AS n FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT o_custkey AS k, count(*) AS n FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) o
        |  ON c.k = o.k
        |ORDER BY custkey""") { (s, dir) =>
      import s.implicits._
      val cust = Tables.t(s, dir, "customer").select(col("c_custkey").as[Long])
      val open = Tables.t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as[Long])
      cust.groupByKey(identity)
        .cogroup(open.groupByKey(identity)) { (k, cs, os) =>
          Iterator((k, cs.size.toLong, os.size.toLong))
        }
        .toDF("custkey", "n_cust", "n_orders")
        .orderBy(col("custkey"))
    },

    // ----- §2.5 GROUPING SETS / ROLLUP (reference
    // DecomposeGroupingSetRule.scala:32; Spark Expand is native). gid
    // computed as grouping(a)*2+grouping(b) for engine portability -----
    q("q10_rollup",
      """SELECT n_name, c_mktsegment,
        |  CAST(grouping(n_name) * 2 + grouping(c_mktsegment) AS INTEGER) AS gid,
        |  count(*) AS n, CAST(round(sum(CAST(c_acctbal AS decimal(18,4))), 4) AS DOUBLE) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)
        |ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST""") { (s, dir) =>
      Tables.t(s, dir, "customer")
        .join(broadcast(Tables.t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(
          (grouping(col("n_name")) * 2 + grouping(col("c_mktsegment"))).cast("int").as("gid"),
          count(lit(1)).as("n"),
          moneyOut(sum(dec(col("c_acctbal")))).as("sum_bal"))
        .select(col("n_name"), col("c_mktsegment"), col("gid"), col("n"), col("sum_bal"))
        .orderBy(col("gid"), col("n_name").asc_nulls_first, col("c_mktsegment").asc_nulls_first)
    },

    // ----- §2.5 CUBE -----
    q("q11_cube",
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INTEGER) AS gid,
        |  count(*) AS n
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""") { (s, dir) =>
      Tables.t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg((grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority"))).cast("int").as("gid"),
          count(lit(1)).as("n"))
        .orderBy(col("gid"), col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // ----- §2.5 distinct / dropDuplicates (DataSet.java:596) -----
    q("q12_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INTEGER) AS ship_year
        |FROM lineitem
        |ORDER BY l_returnflag, l_linestatus, ship_year""") { (s, dir) =>
      Tables.t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"), year(col("l_shipdate")).as("ship_year"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"), col("ship_year"))
    },

    // ----- §2.5 COUNT(DISTINCT) expansion (FlinkRuleSets.scala:165;
    // Spark RewriteDistinctAggregates is native) -----
    q("q13_count_distinct",
      """SELECT c_nationkey,
        |  count(DISTINCT c_mktsegment) AS n_segments,
        |  count(DISTINCT c_custkey) AS n_cust,
        |  count(*) AS n_rows
        |FROM customer
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""") { (s, dir) =>
      Tables.t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
          countDistinct(col("c_custkey")).as("n_cust"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("c_nationkey"))
    },

    // ----- §2.5 minBy/maxBy (DataSet.java:523, KeyedStream.java:849)
    // via max_by/min_by with a (value, key) struct tie-break; oracle
    // expresses the same semantics through a window — an independent
    // formulation, as an oracle should be -----
    q("q14_minby_maxby",
      """SELECT c_mktsegment, c_name AS richest, c_acctbal AS bal
        |FROM (SELECT c_mktsegment, c_name, c_acctbal,
        |        row_number() OVER (PARTITION BY c_mktsegment
        |                           ORDER BY c_acctbal DESC, c_custkey) AS rn
        |      FROM customer)
        |WHERE rn = 1
        |ORDER BY c_mktsegment""") { (s, dir) =>
      Tables.t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(
          max_by(col("c_name"), struct(col("c_acctbal"), -col("c_custkey"))).as("richest"),
          max(col("c_acctbal")).as("bal"))
        .orderBy(col("c_mktsegment"))
    },

    // ----- §2.5 first(n) per group (DataSet.java:574) as window top-n -----
    q("q15_first_n",
      """SELECT c_custkey, o_orderkey, o_totalprice
        |FROM (SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // ----- §2.6 OVER aggregates: running sum / row_number / lag / lead
    // (reference DataStreamOverAggregate.scala; batch-side here) -----
    // window order carries l_quantity + l_extendedprice as trailing
    // tie-breakers: the synthetic lineitem is NOT unique on
    // (l_orderkey, l_linenumber) at every sf (sf0.1 has colliding
    // pairs), and an engine-dependent tie order flips lag/lead and the
    // running sum. With every REFERENCED column in the order, tied
    // rows are identical in the output, so both engines agree.
    q("q16_over_running",
      s"""SELECT l_suppkey, l_orderkey, l_linenumber,
         |  CAST(row_number() OVER w AS INTEGER) AS rn,
         |  CAST(round(sum(CAST(l_extendedprice AS $DEC))
         |    OVER (w ROWS UNBOUNDED PRECEDING), 4) AS DOUBLE) AS running_rev,
         |  lag(l_quantity) OVER w AS prev_qty,
         |  lead(l_quantity) OVER w AS next_qty
         |FROM lineitem
         |WINDOW w AS (PARTITION BY l_suppkey
         |             ORDER BY l_shipdate, l_orderkey, l_linenumber,
         |                      l_quantity, l_extendedprice)
         |ORDER BY l_suppkey, rn""") { (s, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      Tables.t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).as("rn"),
          moneyOut(sum(dec(col("l_extendedprice"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))).as("running_rev"),
          lag(col("l_quantity"), 1).over(w).as("prev_qty"),
          lead(col("l_quantity"), 1).over(w).as("next_qty"))
        .orderBy(col("l_suppkey"), col("rn"))
    },

    // ----- §2.6 bounded ROWS + RANGE frames, rank family
    // (ProcTimeBoundedRowsOver/RangeOver analogs on batch) -----
    q("q17_over_frames",
      s"""SELECT o_orderkey,
         |  round(avg(o_totalprice) OVER (PARTITION BY o_orderstatus
         |      ORDER BY o_totalprice, o_orderkey
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg,
         |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
         |      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_near,
         |  CAST(rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS INTEGER) AS prio_rank,
         |  CAST(dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_orderpriority) AS INTEGER) AS prio_dense,
         |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
         |FROM orders
         |ORDER BY o_orderkey""") { (s, dir) =>
      val byPrice = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val byPriceVal = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"))
      val byPrio = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderpriority"))
      Tables.t(s, dir, "orders")
        .select(col("o_orderkey"),
          round(avg(col("o_totalprice")).over(byPrice.rowsBetween(-2, 0)), 6).as("mov_avg"),
          count(lit(1)).over(byPriceVal.rangeBetween(-10000, 0)).as("n_near"),
          rank().over(byPrio).as("prio_rank"),
          dense_rank().over(byPrio).as("prio_dense"),
          ntile(4).over(byPrice).as("quartile"))
        .orderBy(col("o_orderkey"))
    },

    // ----- §2.7 total ORDER BY + OFFSET/FETCH (DataSetSort.scala:82) -----
    q("q18_orderby_limit_offset",
      """SELECT o_orderkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 5""") { (s, dir) =>
      Tables.t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(5).limit(20)
    },

    // ----- §2.8 set operations (table.scala:838-967) -----
    q("q19_union_all",
      """SELECT k FROM (
        |  SELECT c_nationkey AS k FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS k FROM supplier)
        |ORDER BY k""") { (s, dir) =>
      Tables.t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .union(Tables.t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    },

    q("q20_union_distinct",
      """SELECT c_nationkey AS k FROM customer
        |UNION
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""") { (s, dir) =>
      Tables.t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .union(Tables.t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .distinct()
        .orderBy(col("k"))
    },

    q("q21_intersect",
      """SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""") { (s, dir) =>
      Tables.t(s, dir, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("k"))
        .intersect(Tables.t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    },

    q("q22_except",
      """SELECT c_nationkey AS k FROM customer
        |EXCEPT
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""") { (s, dir) =>
      Tables.t(s, dir, "customer").select(col("c_nationkey").as("k"))
        .except(Tables.t(s, dir, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))
    },

    q("q23_intersect_all",
      """SELECT n_regionkey AS k FROM nation WHERE n_nationkey < 20
        |INTERSECT ALL
        |SELECT n_regionkey AS k FROM nation WHERE n_nationkey >= 5
        |ORDER BY k""") { (s, dir) =>
      val n = Tables.t(s, dir, "nation")
      n.filter(col("n_nationkey") < 20).select(col("n_regionkey").as("k"))
        .intersectAll(n.filter(col("n_nationkey") >= 5).select(col("n_regionkey").as("k")))
        .orderBy(col("k"))
    },

    q("q24_except_all",
      """SELECT n_regionkey AS k FROM nation
        |EXCEPT ALL
        |SELECT n_regionkey AS k FROM nation WHERE n_nationkey >= 10
        |ORDER BY k""") { (s, dir) =>
      val n = Tables.t(s, dir, "nation")
      n.select(col("n_regionkey").as("k"))
        .exceptAll(n.filter(col("n_nationkey") >= 10).select(col("n_regionkey").as("k")))
        .orderBy(col("k"))
    },

    // ----- §2.5 summary statistics (DataSetUtils.summarize) -----
    q("q25_summary_stats",
      """SELECT
        |  count(*) AS n,
        |  round(avg(c_acctbal), 6) AS mean_bal,
        |  round(stddev_samp(c_acctbal), 6) AS std_bal,
        |  round(stddev_pop(c_acctbal), 6) AS stdp_bal,
        |  round(var_samp(c_acctbal), 6) AS var_bal,
        |  round(var_pop(c_acctbal), 6) AS varp_bal,
        |  min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |  count(c_name) AS n_name
        |FROM customer""") { (s, dir) =>
      Tables.t(s, dir, "customer").agg(
        count(lit(1)).as("n"),
        round(avg(col("c_acctbal")), 6).as("mean_bal"),
        round(stddev_samp(col("c_acctbal")), 6).as("std_bal"),
        round(stddev_pop(col("c_acctbal")), 6).as("stdp_bal"),
        round(var_samp(col("c_acctbal")), 6).as("var_bal"),
        round(var_pop(col("c_acctbal")), 6).as("varp_bal"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        count(col("c_name")).as("n_name"))
    },

    // ----- §3.3 SQL surface: correlated scalar subquery + IN subquery
    // (Calcite SubQueryRemoveRule ≈ Spark RewritePredicateSubquery),
    // exercised through spark.sql on registered views -----
    q("q26_subqueries_sql",
      """SELECT o_orderkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
        |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |ORDER BY o_orderkey""") { (s, dir) =>
      Tables.views(s, dir)
      s.sql(
        """SELECT o_orderkey, o_totalprice
          |FROM orders o
          |WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.5 FROM orders)
          |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          |ORDER BY o_orderkey""".stripMargin)
    },

    // ----- §2.5 COLLECT multiset agg (aggregations.scala:300 Collect →
    // here surfaced as a sorted list for engine-portable comparison) -----
    q("q27_collect_list",
      """SELECT n_regionkey AS k, string_agg(n_name, ',' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey
        |ORDER BY k""") { (s, dir) =>
      Tables.t(s, dir, "nation")
        .groupBy(col("n_regionkey").as("k"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"))
        .orderBy(col("k"))
    },

    // ----- §2.3 flatMap/explode (DataStream.java:609 flatMap; SQL
    // UNNEST via LogicalUnnestRule → Spark explode) -----
    q("q28_explode_words",
      """SELECT * FROM (
        |  SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part)
        |ORDER BY p_partkey, word""") { (s, dir) =>
      Tables.t(s, dir, "part")
        .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
        .orderBy(col("p_partkey"), col("word"))
    }
  )
}
