package graft.queries

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2b): scans, filters, joins
  * (broadcast / shuffle / semi / anti / theta), aggregation (incl. distinct,
  * rollup, median), window functions, sort/limit, set ops, scalar function
  * families, pivot, and event-time windows in batch mode.
  *
  * Every query is written for scale first: filters sit directly on the scan
  * (pushed to parquet), dimension joins are explicitly broadcast, aggregates
  * are partial+final hash aggregates, and top-k uses per-group windows (no
  * global collect). Money aggregates use graft.functions.Exact so results are
  * bit-identical to the DuckDB oracle regardless of partition merge order.
  *
  * Each query carries its DuckDB oracle SQL with IDENTICAL column names and
  * a total-order ORDER BY so the driver's hash compare is deterministic.
  */
/** Typed row for the Dataset-API surface (q89). */
case class OrderRow(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
    o_totalprice: Double, o_orderpriority: String)

object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- q01
  private val q01: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumIntegral(col("l_quantity")).as("sum_qty"),
        sumMoney(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        sum(charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).cast("double").as("sum_charge"),
        (sumIntegral(col("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        avgMoney(col("l_extendedprice")).as("avg_price"),
        (sum(pct(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      | CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  private val q02: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24 &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("long").as("qty"),
        col("l_extendedprice"),
        discPrice(col("l_extendedprice"), col("l_discount")).cast("double").as("disc_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty, l_extendedprice,
      | CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS disc_price
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q03
  private val q03: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sumMoney(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .filter(col("n_orders") > 5)
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q03Sql =
    """SELECT r_name, n_name,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      | JOIN nation ON c_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name HAVING COUNT(*) > 5 ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q04
  private val q04: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
    Tables.orders(s, d)
      .join(rev, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"), col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val q04Sql =
    """SELECT o_orderkey, o_orderdate, o_totalprice, revenue
      |FROM orders JOIN (
      |  SELECT l_orderkey, CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |  FROM lineitem GROUP BY l_orderkey
      |) ON o_orderkey = l_orderkey
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q05
  private val q05: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("2001-06-01").cast("timestamp"))
    Tables.orders(s, d)
      .join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  private val q05Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '2001-06-01')
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Anti-join against a filtered right side (customers with no URGENT
    * order) — returns real rows at every SF, so the oracle checks content,
    * not just emptiness. */
  private val q06: Q = (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))

  private val q06Sql =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q07
  private val q07: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"),
        sum_distinct(col("l_quantity").cast("long")).as("sum_dist_qty"))
      .orderBy(col("l_returnflag"))

  private val q07Sql =
    """SELECT l_returnflag,
      | COUNT(DISTINCT l_orderkey) AS n_orders,
      | COUNT(DISTINCT l_suppkey) AS n_supps,
      | COUNT(*) AS n_rows,
      | CAST(SUM(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_dist_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q08
  private val q08: Q = (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumIntegral(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q08Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q09
  private val q09: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("revenue").desc, col("l_partkey"))
    rev.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("l_suppkey"), col("rn"))
  }

  private val q09Sql =
    """SELECT l_suppkey, l_partkey, revenue, rn FROM (
      | SELECT l_suppkey, l_partkey, revenue,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey ORDER BY revenue DESC, l_partkey) AS BIGINT) AS rn
      | FROM (
      |  SELECT l_suppkey, l_partkey,
      |   CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |  FROM lineitem GROUP BY l_suppkey, l_partkey))
      |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin

  // ---------------------------------------------------------------- q10
  private val q10: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("run_total",
        sum(money(col("o_totalprice")))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("run_total"), col("prev_price"), col("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val q10Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_total,
      | lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
      | lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q11
  private val q11: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  private val q11Sql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- q12
  private val q12: Q = (s, d) => {
    val rich = Tables.customer(s, d).filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    rich.union(urgent).distinct().withColumn("op", lit("union"))
      .unionByName(rich.intersect(urgent).withColumn("op", lit("intersect")))
      .unionByName(rich.except(urgent).withColumn("op", lit("except")))
      .select(col("op"), col("c_custkey"))
      .orderBy(col("op"), col("c_custkey"))
  }

  private val q12Sql =
    """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
      | urgent AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM rich UNION SELECT c_custkey FROM urgent)
      |UNION ALL SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM rich INTERSECT SELECT c_custkey FROM urgent)
      |UNION ALL SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM rich EXCEPT SELECT c_custkey FROM urgent)
      |ORDER BY op, c_custkey""".stripMargin

  // ---------------------------------------------------------------- q13
  private val q13: Q = (s, d) =>
    Tables.part(s, d)
      .select(
        col("p_partkey"),
        upper(col("p_type")).as("type_up"),
        lower(col("p_brand")).as("brand_lo"),
        substring(col("p_name"), 1, 10).as("name10"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_replace(col("p_type"), " ", "_").as("type_us"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        lpad(col("p_brand"), 12, "*").as("brand_pad"),
        instr(col("p_type"), "a").cast("long").as("a_pos"))
      .orderBy(col("p_partkey"))

  private val q13Sql =
    """SELECT p_partkey, upper(p_type) AS type_up, lower(p_brand) AS brand_lo,
      | substr(p_name, 1, 10) AS name10, CAST(length(p_name) AS BIGINT) AS name_len,
      | replace(p_type, ' ', '_') AS type_us,
      | p_brand || ':' || p_type AS brand_type,
      | lpad(p_brand, 12, '*') AS brand_pad,
      | CAST(strpos(p_type, 'a') AS BIGINT) AS a_pos
      |FROM part ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q14
  private val q14: Q = (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"),
        dayofmonth(col("o_orderdate")).cast("long").as("o_day"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("days_since"),
        date_format(date_add(to_date(col("o_orderdate")), 30), "yyyy-MM-dd").as("plus30"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"))
      .orderBy(col("o_orderkey"))

  private val q14Sql =
    """SELECT o_orderkey,
      | CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      | CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS o_month,
      | CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS o_day,
      | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      | CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since,
      | strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
      | strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q15
  private val q15: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - 30000.0).as("absdiff"),
        floor(col("l_quantity") / 7).as("qdiv7"),
        ceil(col("l_quantity") / 7).as("qdiv7c"),
        sqrt(col("l_quantity")).as("qsqrt"),
        (col("l_orderkey") % 97).as("okmod"),
        round(log(col("l_extendedprice")), 6).as("lnp"),
        round(exp(col("l_discount")), 6).as("expd"),
        (col("l_discount") * col("l_discount")).as("dsq"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q15Sql =
    """SELECT l_orderkey, l_linenumber,
      | abs(l_extendedprice - 30000.0) AS absdiff,
      | CAST(floor(l_quantity / 7) AS BIGINT) AS qdiv7,
      | CAST(ceil(l_quantity / 7) AS BIGINT) AS qdiv7c,
      | sqrt(l_quantity) AS qsqrt,
      | l_orderkey % 97 AS okmod,
      | round(ln(l_extendedprice), 6) AS lnp,
      | round(exp(l_discount), 6) AS expd,
      | l_discount * l_discount AS dsq
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---------------------------------------------------------------- q16
  private val q16: Q = (s, d) =>
    Tables.customer(s, d)
      .withColumn("bucket",
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high"))
      .withColumn("seg_nb", nullif(col("c_mktsegment"), lit("BUILDING")))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        count(col("seg_nb")).as("n_not_building"),
        sumMoney(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("bucket"))

  private val q16Sql =
    """SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 3000 THEN 'low'
      |  WHEN c_acctbal < 7000 THEN 'mid' ELSE 'high' END AS bucket,
      | COUNT(*) AS n,
      | COUNT(nullif(c_mktsegment, 'BUILDING')) AS n_not_building,
      | CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS sum_bal
      |FROM customer GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---------------------------------------------------------------- q17
  private val q17: Q = (s, d) => {
    val p = Tables.part(s, d)
    val li = Tables.lineitem(s, d)
    li.join(broadcast(p),
        li("l_partkey") === p("p_partkey") &&
          li("l_quantity") >= p("p_size") - 5 && li("l_quantity") <= p("p_size") + 5)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sumIntegral(col("l_quantity")).as("sum_qty"))
      .orderBy(col("p_brand"))
  }

  private val q17Sql =
    """SELECT p_brand, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      | AND l_quantity >= p_size - 5 AND l_quantity <= p_size + 5
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q18
  private val q18: Q = (s, d) => {
    val p = Tables.part(s, d)
    val b = p.groupBy(col("p_brand").as("b_brand"))
      .agg(sum(money(col("p_retailprice"))).as("brand_sum"), count(lit(1)).as("brand_n"))
    p.join(broadcast(b), col("p_brand") === col("b_brand"))
      .filter(money(col("p_retailprice")) * col("brand_n") > col("brand_sum"))
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
      .orderBy(col("p_partkey"))
  }

  private val q18Sql =
    """WITH b AS (SELECT p_brand AS b_brand,
      |  SUM(CAST(p_retailprice AS DECIMAL(15,2))) AS brand_sum, COUNT(*) AS brand_n
      | FROM part GROUP BY p_brand)
      |SELECT p_partkey, p_brand, p_retailprice
      |FROM part JOIN b ON p_brand = b_brand
      |WHERE CAST(p_retailprice AS DECIMAL(15,2)) * brand_n > brand_sum
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q19
  private val q19: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_totalprice").between(10000, 200000) &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  private val q19Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND o_totalprice BETWEEN 10000 AND 200000
      |  AND o_orderdate >= TIMESTAMP '1997-01-01'
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q20
  private val q20: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    li.filter(col("l_returnflag") === "A")
      .unionAll(li.filter(col("l_returnflag") === "R"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sumIntegral(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  private val q20Sql =
    """SELECT l_returnflag, COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM (SELECT * FROM lineitem WHERE l_returnflag = 'A'
      |      UNION ALL SELECT * FROM lineitem WHERE l_returnflag = 'R')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q21
  private val q21: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
        col("o_orderdate").as("first_orderdate"), col("o_totalprice").as("first_price"))
      .orderBy(col("o_custkey"))
  }

  private val q21Sql =
    """SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate,
      | o_totalprice AS first_price
      |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  // ---------------------------------------------------------------- q27
  private val q27: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("med_qty"),
        max(col("l_quantity")).as("max_qty"),
        min(col("l_quantity")).as("min_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val q27Sql =
    """SELECT l_returnflag, median(l_quantity) AS med_qty, max(l_quantity) AS max_qty,
      | min(l_quantity) AS min_qty, COUNT(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q28
  private val q28: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        array_join(sort_array(collect_set(col("l_linestatus"))), ",").as("statuses"),
        countDistinct(col("l_linestatus")).as("n_statuses"))
      .orderBy(col("l_returnflag"))

  private val q28Sql =
    """SELECT l_returnflag,
      | array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
      | COUNT(DISTINCT l_linestatus) AS n_statuses
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q46
  private val q46: Q = (s, d) =>
    Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumIntegral(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val q46Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q47
  /** GROUPING SETS via SQL — identical surface in Spark SQL and DuckDB. */
  private val q47: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin)
  }

  private val q47Sql =
    """SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- q48
  /** 4-table join through supplier: big fact shuffles once on l_suppkey;
    * nation/region are broadcast (dimension tables stay small at any SF). */
  private val q48: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(sup, li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(discPrice(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val q48Sql =
    """SELECT r_name, n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      | COUNT(DISTINCT s_suppkey) AS n_suppliers,
      | COUNT(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation ON s_nationkey = n_nationkey
      | JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Explicit sort-merge join (hint("merge")): the fact-to-fact shape where
    * neither side fits in a broadcast at production scale. Both sides
    * shuffle-partition on the key; no build-side memory pressure. */
  private val q49: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
    Tables.orders(s, d).hint("merge")
      .join(li.hint("merge"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("n_items"))
      .orderBy(col("o_orderkey"))
  }

  private val q49Sql =
    """SELECT o_orderkey, o_orderpriority, n_items
      |FROM orders JOIN (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey)
      | ON o_orderkey = l_orderkey
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------- q70
  /** Correlated subqueries through the SQL front door: EXISTS / NOT EXISTS
    * plus two correlated scalar subqueries. Catalyst decorrelates all four
    * into joins (semi, anti, and two aggregated left joins) — no per-row
    * re-execution, which is what makes the construct usable at scale. */
  private val q70: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer_cs")
    Tables.orders(s, d).createOrReplaceTempView("orders_cs")
    s.sql(
      """SELECT c_custkey, c_name,
        | (SELECT COUNT(*) FROM orders_cs WHERE o_custkey = c_custkey) AS n_orders,
        | (SELECT MAX(o_totalprice) FROM orders_cs WHERE o_custkey = c_custkey) AS max_price
        |FROM customer_cs
        |WHERE EXISTS (SELECT 1 FROM orders_cs WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders_cs WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin)
  }

  private val q70Sql =
    """SELECT c_custkey, c_name,
      | (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      | (SELECT MAX(o_totalprice) FROM orders WHERE o_custkey = c_custkey) AS max_price
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q71
  /** Distribution window functions: ntile / percent_rank / cume_dist.
    * percent_rank = (rank-1)/(n-1) over identical integer operands is the
    * same IEEE double in any engine — no rounding needed. */
  private val q71: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
      .orderBy(col("c_custkey"))
  }

  private val q71Sql =
    """SELECT c_custkey, c_mktsegment,
      | CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      | percent_rank() OVER w AS pct_rank,
      | cume_dist() OVER w AS cdist
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- q72
  /** Array/collection function surface reduced to scalar outputs (sort,
    * slice, reverse, distinct, membership, element access with NULL-safe
    * try_element_at — DuckDB list indexing is 1-based and NULL out of
    * range, so both sides agree). */
  private val q72: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("w", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        expr("try_element_at(w, 1)").as("first_word"),
        expr("try_element_at(w, -1)").as("last_word"),
        concat_ws(",", slice(sort_array(col("w")), 1, 5)).as("sorted5"),
        concat_ws(",", slice(reverse(col("w")), 1, 3)).as("rev3"),
        size(array_distinct(col("w"))).cast("long").as("n_uniq"),
        array_contains(col("w"), "the").as("has_the"))
      .orderBy(col("doc_id"))

  private val q72Sql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, w[1] AS first_word, w[-1] AS last_word,
      | array_to_string(list_sort(w)[1:5], ',') AS sorted5,
      | array_to_string(list_reverse(w)[1:3], ',') AS rev3,
      | CAST(len(list_distinct(w)) AS BIGINT) AS n_uniq,
      | list_contains(w, 'the') AS has_the
      |FROM t ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Deterministic hash-bucket sampling: rows where a 60-bit md5 of the key
    * lands in bucket 0 of 10. Unlike TABLESAMPLE (engine-specific RNG) or
    * `% 10` on raw keys (biased under clustered key assignment), a hash
    * bucket is uniform, reproducible on any engine, and pushes down as a
    * plain filter — the standard way to carve a stable sample from 100 TB. */
  private val q73: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(graft.functions.PortableHash.md5Bucket60(col("l_orderkey").cast("string"))
        .cast("long") % 10 === 0)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        (count(lit(1)) * 10).as("est_total_rows"))
      .orderBy(col("l_returnflag"))

  private val q73Sql =
    """SELECT l_returnflag, COUNT(*) AS n_sampled,
      | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      | CAST(COUNT(*) * 10 AS BIGINT) AS est_total_rows
      |FROM lineitem
      |WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15)) AS BIGINT) % 10 = 0
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q74
  /** Skew-salted shuffle join (graft.operators.SaltedJoin): orders salted
    * over 8 sub-keys, customer replicated 8× — the hot-key straggler
    * defuser when the dimension is too big to broadcast. Salting must be
    * result-invariant, so the oracle is the PLAIN join. */
  private val q74: Q = (s, d) => {
    val orders = Tables.orders(s, d).select(col("o_custkey"), col("o_totalprice"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    graft.operators.SaltedJoin.saltedJoin(orders, cust, "o_custkey", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  private val q74Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q76
  /** TPC-H Q2-flavored "min-cost supplier per part": per-(part, supplier)
    * minimum unit price from the fact table, then a per-part top-1 window.
    * min() is a selection (order-independent, exact on doubles), the window
    * is bounded per part key, and part/supplier joins are broadcast dims —
    * the whole plan is two hash aggregates + small joins at any scale. */
  private val q76: Q = (s, d) => {
    // Unit price in exact integer milli-cents: round(double, 4) straddles
    // the .5 boundary differently per engine (observed at sf0.1), so the
    // comparable quantity is integer division — portable at any scale.
    //
    // The selective part filter joins BELOW the aggregate: Catalyst cannot
    // push a join under a groupBy itself, and the filter is on the group
    // key, so pre-joining is semantics-preserving and cuts the rows the
    // aggregate + window ever see (~10× here, the same ratio at 100 TB).
    val parts = broadcast(Tables.part(s, d).filter(col("p_size") > 45)
      .select(col("p_partkey"), col("p_name")))
    val unit = Tables.lineitem(s, d)
      .join(parts, col("p_partkey") === col("l_partkey"))
      .withColumn("unit_mc",
        expr("CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT) * 1000 div CAST(l_quantity AS BIGINT)"))
      .groupBy(col("l_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(col("unit_mc")).as("min_unit_mc"))
    val w = Window.partitionBy(col("l_partkey")).orderBy(col("min_unit_mc"), col("l_suppkey"))
    unit.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") === 1)
      .join(broadcast(Tables.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
      .select(col("l_partkey").as("p_partkey"), col("p_name"), col("s_name"),
        (col("min_unit_mc").cast("double") / 100000).as("unit_cost"))
      .orderBy(col("p_partkey"))
  }

  private val q76Sql =
    """WITH unit AS (
      | SELECT l_partkey, l_suppkey,
      |  min(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT) * 1000
      |      // CAST(l_quantity AS BIGINT)) AS min_unit_mc
      | FROM lineitem GROUP BY l_partkey, l_suppkey),
      |r AS (SELECT l_partkey, l_suppkey, min_unit_mc,
      | CAST(ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY min_unit_mc, l_suppkey) AS BIGINT) AS rk
      | FROM unit)
      |SELECT p_partkey, p_name, s_name, CAST(min_unit_mc AS DOUBLE) / 100000 AS unit_cost
      |FROM r JOIN part ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey
      |WHERE rk = 1 AND p_size > 45
      |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------- q77
  /** TPC-H Q13: customer order-count distribution. The left join keeps
    * zero-order customers; both aggregation levels are exact integer hash
    * aggregates. */
  private val q77: Q = (s, d) => {
    val counts = Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    counts.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q77Sql =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      | SELECT c_custkey, COUNT(o_orderkey) AS c_count
      | FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- q78
  /** TPC-H Q8-flavored market share: one nation's revenue share per order
    * year. Both the numerator (CASE inside the sum) and denominator are
    * exact decimal sums computed in ONE aggregation pass; the share is a
    * single final double division. */
  private val q78: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val rev = li
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"), col("n_name"),
        discPrice(col("l_extendedprice"), col("l_discount")).as("r"))
    rev.groupBy(col("o_year"))
      .agg(
        (sum(when(col("n_name") === "NATION_9", col("r")).otherwise(lit(0).cast(Money)))
          .cast("double") / sum(col("r")).cast("double")).as("mkt_share"),
        sum(col("r")).cast("double").as("total_rev"))
      .orderBy(col("o_year"))
  }

  private val q78Sql =
    """WITH rev AS (
      | SELECT EXTRACT(year FROM o_orderdate) AS o_year, n_name,
      |  CAST(l_extendedprice AS DECIMAL(15,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS r
      | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey JOIN nation ON s_nationkey = n_nationkey)
      |SELECT CAST(o_year AS BIGINT) AS o_year,
      | CAST(SUM(CASE WHEN n_name = 'NATION_9' THEN r ELSE CAST(0 AS DECIMAL(15,2)) END) AS DOUBLE) /
      |  CAST(SUM(r) AS DOUBLE) AS mkt_share,
      | CAST(SUM(r) AS DOUBLE) AS total_rev
      |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Typed Dataset surface (SURVEY §1.3): case-class rows with compile-time
    * checked field access where type safety helps, switching back to
    * untyped columns for the aggregate. This hybrid is the recommended
    * shape: the typed filter here compiles to the same pushed-down
    * predicate as the Column version (it's a column expression, not a
    * lambda — closures would be opaque to Catalyst and kill pushdown),
    * and the aggregation stays a codegen'd hash aggregate. */
  private val q89: Q = (s, d) => {
    import s.implicits._
    val orders: org.apache.spark.sql.Dataset[OrderRow] =
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority")).as[OrderRow]
    orders
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 100000.0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(money(col("o_totalprice"))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  private val q89Sql =
    """SELECT o_orderstatus, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
      |FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 100000.0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q44
  /** HLL++ approximate distinct counts, ORACLE-VERIFIED via an error band:
    * the sketch estimate itself is not portable to DuckDB, but it IS
    * deterministic (HLL registers merge by max, so the estimate is
    * partition- and order-invariant for a fixed dataset). The query emits
    * the exact distinct counts plus booleans asserting the sketch landed
    * within 3× the configured rsd (0.05) of exact — a stable fact the
    * oracle states as literal TRUE. A sketch regression (wrong hashing,
    * broken merge) flips the boolean and fails the hash compare.
    *
    * Two aggregates on purpose, not one: a combined agg plans the HLL
    * sketches inside the multi-distinct Expand rewrite, whose first-stage
    * groups are (flag, orderkey)/(flag, partkey) — two 1 KB-class HLL
    * buffers allocated per DISTINCT KEY (~350 k groups at sf0.1, 2.3 s
    * measured) instead of per flag. Splitting gives the sketches their own
    * plain 6-group aggregate (buffer count = flags × partitions), the
    * exact counts their Expand, and a broadcast join of two 3-row results
    * — 0.85 s at sf0.1 despite the second scan. At 100 TB the second scan
    * reads two int columns; per-key sketch buffers would be ~TBs of
    * aggregation state. */
  private val q44: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"))
    val approx = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_orderkey"), rsd = 0.05).as("_ao"),
        approx_count_distinct(col("l_partkey"), rsd = 0.05).as("_ap"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("_ao") - col("exact_orders")) <=
          col("exact_orders") * 0.15).as("orders_in_band"),
        (abs(col("_ap") - col("exact_parts")) <=
          col("exact_parts") * 0.15).as("parts_in_band"))
      .orderBy(col("l_returnflag"))
  }

  private val q44Sql =
    """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS exact_orders,
      | COUNT(DISTINCT l_partkey) AS exact_parts,
      | TRUE AS orders_in_band, TRUE AS parts_in_band
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- q107
  /** TPC-H Q17/Q20-shaped decorrelation: a SCALAR AGGREGATE subquery,
    * correlated on the OUTER side's join key, inside the WHERE — "lineitems
    * ordering less than 1/5 of their part's average quantity" (the one
    * classic decorrelation shape q70's COUNT/MAX projections don't cover:
    * here the correlated aggregate gates the filter, so a naive engine
    * re-runs an aggregation per outer row). Catalyst decorrelates both
    * aggregates into per-partkey partial+final hash aggregates joined
    * BELOW the filter — the executed plan (PLANS.md) is two aggregated
    * broadcast joins (COUNT and SUM subtrees) with no subquery nodes;
    * QueryInventorySpec pins the no-subquery shape mechanically. At
    * 100 TB that is the difference between a constant number of shuffles
    * and |outer| aggregate jobs.
    *
    * Exact arithmetic: `qty < 0.2 * avg(qty)` is stated as
    * `5 * qty * count < sum` — quantities are integral, so both engines
    * compare exact BIGINTs (no double-division boundary rounding); money
    * sums ride as DECIMAL(15,2) cents. */
  private val q107: Q = (s, d) => {
    Tables.part(s, d).createOrReplaceTempView("part_cagg")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_cagg")
    s.sql(
      """SELECT p_brand, COUNT(*) AS n_small,
        | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT)
        |   AS sum_price_cents
        |FROM part_cagg JOIN lineitem_cagg ON l_partkey = p_partkey
        |WHERE p_size <= 5
        |  AND 5 * CAST(l_quantity AS BIGINT) *
        |      (SELECT COUNT(*) FROM lineitem_cagg l2 WHERE l2.l_partkey = p_partkey)
        |    < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem_cagg l2
        |       WHERE l2.l_partkey = p_partkey)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
  }

  private val q107Sql =
    """SELECT p_brand, COUNT(*) AS n_small,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2)) * 100 AS BIGINT)) AS BIGINT)
      |   AS sum_price_cents
      |FROM part JOIN lineitem ON l_partkey = p_partkey
      |WHERE p_size <= 5
      |  AND 5 * CAST(l_quantity AS BIGINT) *
      |      (SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
      |    < (SELECT SUM(CAST(l2.l_quantity AS BIGINT)) FROM lineitem l2
      |       WHERE l2.l_partkey = p_partkey)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q158
  /** TPC-H Q21-shaped multi-existence chain — EXISTS and NOT EXISTS over
    * the SAME child relation, each correlated on an equality (l_orderkey)
    * AND a non-equality (l_suppkey <>) against the outer row: "suppliers
    * whose returned item was the ONLY return in a multi-supplier order".
    * This is the decorrelation shape q70 (independent EXISTS/NOT EXISTS
    * children) and q107 (correlated scalar aggregate) don't cover: two
    * existence predicates over one child must become one LeftSemi and one
    * LeftAnti join keyed on l_orderkey with the inequality as a residual
    * join condition — NO per-row re-execution and NO subquery expression
    * may survive optimization (QueryInventorySpec pins both, plus the
    * semi+anti pair mechanically). At 100 TB the decorrelated form is
    * three orderkey-keyed shuffles of the lineitem scan; the naive form
    * is |l1| probe queries. */
  private val q158: Q = (s, d) => {
    Tables.supplier(s, d).createOrReplaceTempView("supplier_mw")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_mw")
    Tables.orders(s, d).createOrReplaceTempView("orders_mw")
    s.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier_mw
        | JOIN lineitem_mw l1 ON s_suppkey = l1.l_suppkey
        | JOIN orders_mw ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem_mw l2
        |       WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem_mw l3
        |       WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |         AND l3.l_returnflag = 'R')
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin)
  }

  private val q158Sql =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier
      | JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      | JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |       WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |       WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |         AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin

  // ---------------------------------------------------------------- q168
  /** Correlated LATERAL subquery with ORDER BY + LIMIT — the "top-k rows
    * per outer row" SQL surface (TPC-DS-style per-group drill-down; the
    * declarative twin of q76's top-1 and q139's aggregate top-k). Both
    * engines accept the IDENTICAL statement. What makes it engine-surface
    * work rather than sugar: Catalyst decorrelates the per-row LIMIT into
    * WindowGroupLimit — executed plan (PLANS.md) shows a map-side partial
    * WindowGroupLimit BEFORE the exchange (each input split forwards ≤k
    * rows per nation), the final group-limit after, and a broadcast join
    * back to nation — i.e. the engine turns "run a sorted LIMIT query per
    * outer row" into one bounded-exchange pass; a naive evaluator would
    * re-sort customer |nation| times. Money exact (cents). */
  private val q168: Q = (s, d) => {
    Tables.nation(s, d).createOrReplaceTempView("nation_lat")
    Tables.customer(s, d).createOrReplaceTempView("customer_lat")
    s.sql(
      """SELECT n.n_name, c.c_name,
        |       CAST(CAST(c.c_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT) AS acctbal_cents
        |FROM nation_lat n,
        | LATERAL (SELECT c_name, c_acctbal FROM customer_lat
        |          WHERE c_nationkey = n.n_nationkey
        |          ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n_name, acctbal_cents DESC, c_name""".stripMargin)
  }

  private val q168Sql =
    """SELECT n.n_name, c.c_name,
      | CAST(CAST(c.c_acctbal AS DECIMAL(15,2)) * 100 AS BIGINT) AS acctbal_cents
      |FROM nation n,
      | LATERAL (SELECT c_name, c_acctbal FROM customer
      |          WHERE c_nationkey = n.n_nationkey
      |          ORDER BY c_acctbal DESC, c_name LIMIT 2) c
      |ORDER BY n_name, acctbal_cents DESC, c_name""".stripMargin

  // ---------------------------------------------------------------- q126
  /** Integer-exact PageRank ([[graft.operators.PageRankInt]]) over the
    * symmetrized customer↔supplier transaction multigraph (an edge per
    * lineitem in each direction — multiplicity IS the edge weight, so
    * repeat business concentrates rank). Completes the iterative family:
    * ConnectedComponents (reachability), KMeansLloyd (refinement),
    * PageRank (rank flow). Three exact-integer steps in parts-per-billion
    * with floor division at every stage, so [[q126Sql]] replays the whole
    * computation as three unrolled CTE rounds (aggregates are not allowed
    * in a recursive CTE term, and a FIXED iteration count is the portable
    * contract anyway) — no float tolerance anywhere. */
  private val q126: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("cust"), (col("l_suppkey") * 2 + 1).as("supp"))
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(pairs.select(col("supp").as("src"), col("cust").as("dst")))
    graft.operators.PageRankInt.run(edges, iters = 3)
      .select(col("node"), col("rank_ppb"),
        pmod(col("node"), lit(2L)).as("is_supplier"))
      .orderBy(col("node"))
  }

  private val q126Sql = {
    def step(prev: String, out: String): String =
      s"""s$out AS (SELECT e.dst AS node, SUM($prev.r // deg.outdeg) AS acc
         |       FROM e JOIN $prev ON $prev.node = e.src JOIN deg ON deg.src = e.src
         |       GROUP BY e.dst),
         |$out AS (SELECT nodes.node,
         |        (150000000 // n.cnt) + (85 * COALESCE(s$out.acc, 0)) // 100 AS r
         |       FROM nodes LEFT JOIN s$out ON s$out.node = nodes.node, n)""".stripMargin
    s"""WITH ej AS (SELECT o.o_custkey * 2 AS cust, l.l_suppkey * 2 + 1 AS supp
       |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
       |e AS (SELECT cust AS src, supp AS dst FROM ej
       |      UNION ALL SELECT supp, cust FROM ej),
       |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |n AS (SELECT COUNT(*) AS cnt FROM nodes),
       |r0 AS (SELECT node, 1000000000 // n.cnt AS r FROM nodes, n),
       |${step("r0", "r1")},
       |${step("r1", "r2")},
       |${step("r2", "r3")}
       |SELECT node, CAST(r AS BIGINT) AS rank_ppb,
       | CAST(node % 2 AS BIGINT) AS is_supplier
       |FROM r3 ORDER BY node""".stripMargin
  }

  // ---------------------------------------------------------------- q140
  /** Join-key skew audit — the diagnostic a platform team runs BEFORE
    * choosing a join strategy (salt? AQE skew split? broadcast?): for
    * each candidate join key, the row count, distinct-key count, the
    * hottest key's frequency, its corpus share in ppm, and the
    * max/mean-frequency skew ratio. Each audit is one two-level hash
    * aggregate (per-key count → global max/sum/count) — fully map-side
    * combinable, one bounded-row result per key column; the three audits
    * union to a 3-row report. All ratios are exact integer div, so the
    * report is engine-portable (DuckDB SUM returns HUGEINT — cast before
    * the arithmetic on the oracle side). */
  private val q140: Q = (s, d) => {
    def audit(df: DataFrame, keyCol: String, tag: String) =
      df.groupBy(col(keyCol).as("k")).agg(count(lit(1)).as("f"))
        .agg(sum(col("f")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("f")).as("max_freq"))
        .select(lit(tag).as("key_col"), col("n_rows"), col("n_keys"), col("max_freq"),
          expr("max_freq * 1000000 div n_rows").as("top_share_ppm"),
          // skew vs the TRUNCATED integer mean frequency (n_rows div
          // n_keys >= 1 since every key has >=1 row): max_freq*100/avg
          // peaks at ~1e11 where the algebraically-equal
          // max_freq*n_keys*100/n_rows form overflows Long (wrapping
          // silently on Spark, raising on DuckDB) exactly at the billions-
          // of-keys scale this audit targets.
          expr("max_freq * 100 div (n_rows div n_keys)").as("skew_x100"))
    audit(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey")
      .unionByName(audit(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
      .unionByName(audit(Tables.events(s, d), "user_id", "events.user_id"))
      .orderBy(col("key_col"))
  }

  private val q140Sql = {
    def audit(table: String, key: String) =
      s"""SELECT '$table.$key' AS key_col,
         | CAST(SUM(f) AS BIGINT) AS n_rows, CAST(COUNT(*) AS BIGINT) AS n_keys,
         | CAST(MAX(f) AS BIGINT) AS max_freq,
         | CAST(MAX(f) * 1000000 // CAST(SUM(f) AS BIGINT) AS BIGINT) AS top_share_ppm,
         | CAST(MAX(f) * 100 // (CAST(SUM(f) AS BIGINT) // COUNT(*)) AS BIGINT) AS skew_x100
         |FROM (SELECT COUNT(*) AS f FROM $table GROUP BY $key)""".stripMargin
    s"""SELECT * FROM (
       |${audit("lineitem", "l_partkey")}
       |UNION ALL
       |${audit("orders", "o_custkey")}
       |UNION ALL
       |${audit("events", "user_id")})
       |ORDER BY key_col""".stripMargin
  }

  // ---------------------------------------------------------------- q149
  /** CDC merge census (the MERGE INTO / SCD upsert shape expressed as a
    * full-outer key join): a deterministic change batch — every 7th order
    * repriced, a shifted-key insert for every 11th — is merged against
    * the current snapshot and each key classified inserted / updated /
    * unchanged, with the post-merge value sum proving the merge applied
    * the right side. The full outer join is the one shape MERGE cannot
    * broadcast (both sides may contribute unmatched keys); it shuffles
    * both sides BY THE MERGE KEY once — at 100 TB the change batch is
    * normally far smaller than the snapshot, and AQE picks the cheaper
    * build side; everything downstream is a 3-row census. Exact integer
    * cents throughout (Exact money discipline). */
  private val q149: Q = (s, d) => {
    val cur = Tables.orders(s, d)
      .select(col("o_orderkey").as("key"),
        (money(col("o_totalprice")) * 100).cast("long").as("price_cents"))
    // Insert keys are NEGATED (−key−1): o_orderkey is strictly positive at
    // every scale factor, so synthetic inserts can never collide with a
    // real key — a fixed additive offset would start colliding (and
    // silently double-count the census in BOTH engines) once orderkeys
    // pass the offset.
    val upd = cur.filter(col("key") % 7 === 0)
      .select(col("key"), (col("price_cents") + 500L).as("price_cents"))
      .unionByName(cur.filter(col("key") % 11 === 0)
        .select((-col("key") - 1L).as("key"), lit(999L).as("price_cents")))
    cur.select(col("key"), col("price_cents").as("old_p"))
      .join(upd.select(col("key"), col("price_cents").as("new_p")),
        Seq("key"), "full_outer")
      .select(
        when(col("new_p").isNull, "unchanged")
          .when(col("old_p").isNull, "inserted")
          .otherwise("updated").as("action"),
        coalesce(col("new_p"), col("old_p")).as("cur_cents"))
      .groupBy(col("action"))
      .agg(count(lit(1)).as("n"), sum(col("cur_cents")).as("sum_cents"))
      .orderBy(col("action"))
  }

  private val q149Sql =
    """WITH cur AS (SELECT o_orderkey AS key,
      |  CAST(CAST(o_totalprice AS DECIMAL(15,2)) * 100 AS BIGINT) AS price_cents
      | FROM orders),
      |upd AS (
      | SELECT key, price_cents + 500 AS price_cents FROM cur WHERE key % 7 = 0
      | UNION ALL
      | SELECT -key - 1 AS key, 999 AS price_cents FROM cur WHERE key % 11 = 0),
      |m AS (SELECT
      |  CASE WHEN u.key IS NULL THEN 'unchanged'
      |       WHEN c.key IS NULL THEN 'inserted'
      |       ELSE 'updated' END AS action,
      |  COALESCE(u.price_cents, c.price_cents) AS cur_cents
      | FROM cur c FULL OUTER JOIN upd u ON u.key = c.key)
      |SELECT action, CAST(COUNT(*) AS BIGINT) AS n,
      | CAST(SUM(cur_cents) AS BIGINT) AS sum_cents
      |FROM m GROUP BY action ORDER BY action""".stripMargin

  // ---------------------------------------------------------------- q213
  /** Trimmed and winsorized means per event type — the ROBUST location
    * estimators the aggregation family lacked (q27/q81 give exact
    * medians/quantiles; q144 flags outliers; this reports the mean WITH
    * the outliers' influence bounded, the estimator monitoring actually
    * alerts on): k = n div 20 (5 %) values are cut from each tail for
    * the trimmed mean and CLAMPED to the tail boundary values for the
    * winsorized mean. Exact integers throughout: ranks come from ONE
    * event_type-partitioned window under the (cents, event_id) total
    * order (deterministic ties — never a partition-less window), the
    * boundary values are conditional MINs at exact ranks k+1 / n−k, and
    * every mean is an integer div of exact sums.
    *
    * Scale shape: one corpus scan → one per-type window exchange (the
    * event family's standard shuffle, bounded groups per the q81
    * caveat) → one (type) hash agg. At unbounded value domains the q129
    * histogram refinement substitutes for the rank window with identical
    * rank arithmetic. */
  private val q213: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val wR = Window.partitionBy(col("event_type"))
      .orderBy(col("cents"), col("event_id"))
    val wN = Window.partitionBy(col("event_type"))
    val ranked = Tables.events(s, d)
      .select(col("event_type"), col("event_id"),
        (graft.functions.Exact.money(col("value")) * 100).cast("long").as("cents"))
      .withColumn("rk", row_number().over(wR).cast("long"))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("k", expr("n div 20"))
    ranked.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k"),
        sum(col("cents")).as("sum_cents"),
        sum(when(col("rk") > col("k") && col("rk") <= col("n") - col("k"),
          col("cents"))).as("mid_sum"),
        min(when(col("rk") === col("k") + 1, col("cents"))).as("v_lo"),
        min(when(col("rk") === col("n") - col("k"), col("cents"))).as("v_hi"))
      .select(col("event_type"), col("n"), col("k"),
        expr("sum_cents div n").as("mean_cents"),
        expr("mid_sum div (n - 2 * k)").as("trimmed_cents"),
        expr("(mid_sum + k * v_lo + k * v_hi) div n").as("winsor_cents"))
      .orderBy(col("event_type"))
  }

  private val q213Sql =
    """WITH r AS (SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(15,2)) * 100 AS BIGINT) AS cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY event_type
      |                            ORDER BY CAST(CAST(value AS DECIMAL(15,2)) * 100
      |                                          AS BIGINT), event_id) AS BIGINT) AS rk,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM events),
      |g AS (SELECT event_type, MAX(n) AS n, MAX(n // 20) AS k,
      |    SUM(cents) AS sum_cents,
      |    SUM(CASE WHEN rk > n // 20 AND rk <= n - n // 20 THEN cents END) AS mid_sum,
      |    MIN(CASE WHEN rk = n // 20 + 1 THEN cents END) AS v_lo,
      |    MIN(CASE WHEN rk = n - n // 20 THEN cents END) AS v_hi
      |  FROM r GROUP BY event_type)
      |SELECT event_type, n, k,
      |  CAST(sum_cents // n AS BIGINT) AS mean_cents,
      |  CAST(mid_sum // (n - 2 * k) AS BIGINT) AS trimmed_cents,
      |  CAST((mid_sum + k * v_lo + k * v_hi) // n AS BIGINT) AS winsor_cents
      |FROM g ORDER BY event_type""".stripMargin

  val queries: Map[String, Q] = Map(
    "q213_robust_means" -> q213,
    "q149_cdc_merge_census" -> q149,
    "q140_join_skew_audit" -> q140,
    "q126_pagerank" -> q126,
    "q01_pricing_summary" -> q01,
    "q02_filter_project" -> q02,
    "q03_join_broadcast_agg" -> q03,
    "q04_join_shuffle_topk" -> q04,
    "q05_semi_join" -> q05,
    "q06_anti_join" -> q06,
    "q07_agg_distinct" -> q07,
    "q08_rollup" -> q08,
    "q09_window_topk_per_group" -> q09,
    "q10_window_analytics" -> q10,
    "q11_sort_limit" -> q11,
    "q12_set_ops" -> q12,
    "q13_string_funcs" -> q13,
    "q14_date_funcs" -> q14,
    "q15_math_funcs" -> q15,
    "q16_case_coalesce" -> q16,
    "q17_theta_join" -> q17,
    "q18_above_brand_avg" -> q18,
    "q19_in_between" -> q19,
    "q20_union_all_agg" -> q20,
    "q21_first_order_per_customer" -> q21,
    "q27_median_per_group" -> q27,
    "q28_collect_sorted" -> q28,
    "q44_approx_count_distinct" -> q44,
    "q46_cube" -> q46,
    "q47_grouping_sets" -> q47,
    "q48_supplier_region_join" -> q48,
    "q49_sort_merge_join" -> q49,
    "q70_correlated_subqueries" -> q70,
    "q107_correlated_agg_predicate" -> q107,
    "q158_semi_anti_chain" -> q158,
    "q168_lateral_topk" -> q168,
    "q71_distribution_windows" -> q71,
    "q72_collection_funcs" -> q72,
    "q73_hash_bucket_sample" -> q73,
    "q74_salted_skew_join" -> q74,
    "q76_min_cost_supplier" -> q76,
    "q77_order_count_distribution" -> q77,
    "q78_market_share" -> q78,
    "q89_typed_dataset" -> q89)

  val oracle: Map[String, String] = Map(
    "q213_robust_means" -> q213Sql,
    "q149_cdc_merge_census" -> q149Sql,
    "q140_join_skew_audit" -> q140Sql,
    "q126_pagerank" -> q126Sql,
    "q01_pricing_summary" -> q01Sql,
    "q44_approx_count_distinct" -> q44Sql,
    "q02_filter_project" -> q02Sql,
    "q03_join_broadcast_agg" -> q03Sql,
    "q04_join_shuffle_topk" -> q04Sql,
    "q05_semi_join" -> q05Sql,
    "q06_anti_join" -> q06Sql,
    "q07_agg_distinct" -> q07Sql,
    "q08_rollup" -> q08Sql,
    "q09_window_topk_per_group" -> q09Sql,
    "q10_window_analytics" -> q10Sql,
    "q11_sort_limit" -> q11Sql,
    "q12_set_ops" -> q12Sql,
    "q13_string_funcs" -> q13Sql,
    "q14_date_funcs" -> q14Sql,
    "q15_math_funcs" -> q15Sql,
    "q16_case_coalesce" -> q16Sql,
    "q17_theta_join" -> q17Sql,
    "q18_above_brand_avg" -> q18Sql,
    "q19_in_between" -> q19Sql,
    "q20_union_all_agg" -> q20Sql,
    "q21_first_order_per_customer" -> q21Sql,
    "q27_median_per_group" -> q27Sql,
    "q28_collect_sorted" -> q28Sql,
    "q46_cube" -> q46Sql,
    "q47_grouping_sets" -> q47Sql,
    "q48_supplier_region_join" -> q48Sql,
    "q49_sort_merge_join" -> q49Sql,
    "q70_correlated_subqueries" -> q70Sql,
    "q158_semi_anti_chain" -> q158Sql,
    "q168_lateral_topk" -> q168Sql,
    "q107_correlated_agg_predicate" -> q107Sql,
    "q71_distribution_windows" -> q71Sql,
    "q72_collection_funcs" -> q72Sql,
    "q73_hash_bucket_sample" -> q73Sql,
    "q74_salted_skew_join" -> q74Sql,
    "q76_min_cost_supplier" -> q76Sql,
    "q77_order_count_distribution" -> q77Sql,
    "q78_market_share" -> q78Sql,
    "q89_typed_dataset" -> q89Sql)
}
