package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables.Tpch

/** Core relational operator surface (SURVEY.md §2.2-§2.9) re-expressed
  * over the driver testdata. Each query is the Spark-idiomatic form of
  * one reference operator family:
  *   - conditional hash aggregation (A3, daily_airline_performance.py:20-45)
  *   - post-agg KPI ratios with ÷0→null (A4, daily_airline_performance.py:47-72)
  *   - broadcast star joins (J4-J8, facts/fact_flights.py:36-61)
  *   - inner dim chains (J9-J13), left join with cast key (J1-J3,
  *     download_and_ingest.py:134-155), full outer + coalesce (J12,
  *     daily_airport_performance.py:44-68)
  *   - union+distinct dim build (U1/A2, dim_airport.py:8-14)
  *   - top-N (A9/O1), window top-N-per-group (SURVEY §2.5)
  *   - when/otherwise first-match chains (F1), string fns (F2-F5),
  *     calendar fns (F7/F8), generators (G1/G2, dim_date.py / dim_time.py)
  *
  * Scale notes (100 TB): every aggregation here is a map-side-combinable
  * hash agg; joins against dims ≤ a few MB are explicitly `broadcast()`;
  * the only shuffles are on the group-by keys themselves. Outputs are
  * sorted only for oracle determinism (drop the final sort for
  * production pipelines).
  */
object Relational {
  import Portable._

  // -- A3/A8 + F10: grouped sums/avgs, TPC-H Q1 shape -----------------
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.lineitem
        .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          pround(sum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          pround(dsum(col("l_extendedprice")) / count(lit(1)), 4).as("avg_price"),
          pround(dsum(col("l_discount")) / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      ${moneySumSql("l_extendedprice")} AS sum_base_price,
      ${moneySumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
      ${proundSql("sum(l_quantity) / count(*)", 4)} AS avg_qty,
      ${proundSql(s"${dsumSql("l_extendedprice")} / count(*)", 4)} AS avg_price,
      ${proundSql(s"${dsumSql("l_discount")} / count(*)", 6)} AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""))

  // -- A3: conditional sum/avg (sum(when(flag,1)), avg(when(cond,x))) --
  private val q02 = Q(
    "q02_conditional_agg",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("total_rows"),
          sum(when(col("l_quantity") > 25, 1).otherwise(0)).as("big_qty_cnt"),
          sum(when(col("l_discount") === 0, 1).otherwise(0)).as("no_disc_cnt"),
          pround(dsum(when(col("l_discount") > 0, col("l_extendedprice")))
            / sum(when(col("l_discount") > 0, 1).otherwise(0)), 2).as("avg_price_discounted"),
          round(max(col("l_tax")), 2).as("max_tax"),
          round(min(col("l_extendedprice")), 2).as("min_price"))
        .orderBy(col("l_returnflag"))
    },
    // DuckDB integer sum() yields HUGEINT → float64 in pandas → the
    // driver hashes "450.0" vs Spark's "450"; CAST AS BIGINT keeps int64.
    Some(s"""SELECT l_returnflag,
      count(*) AS total_rows,
      CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_qty_cnt,
      CAST(sum(CASE WHEN l_discount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS no_disc_cnt,
      ${proundSql(s"${dsumSql("CASE WHEN l_discount > 0 THEN l_extendedprice END")}" +
        " / sum(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END)", 2)} AS avg_price_discounted,
      round(max(l_tax), 2) AS max_tax,
      round(min(l_extendedprice), 2) AS min_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag"""))

  // -- A4: derived KPI ratios incl. guarded ÷0 → null ------------------
  private val q03 = Q(
    "q03_kpi_ratios",
    (s, dir) => {
      val t = Tpch(s, dir)
      val base = t.orders
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("total_orders"),
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("fulfilled"),
          sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("open_cnt"))
      base.select(
          col("o_orderpriority"), col("total_orders"), col("fulfilled"), col("open_cnt"),
          pround(col("fulfilled") * 100.0 / col("total_orders"), 2).as("fulfilled_pct"),
          when(col("total_orders") - col("fulfilled") === 0, lit(null))
            .otherwise(pround(col("open_cnt") * 100.0 / (col("total_orders") - col("fulfilled")), 2))
            .as("open_share_of_unfulfilled"))
        .orderBy(col("o_orderpriority"))
    },
    Some(s"""SELECT o_orderpriority, total_orders, fulfilled, open_cnt,
      ${proundSql("fulfilled * 100.0 / total_orders", 2)} AS fulfilled_pct,
      CASE WHEN total_orders - fulfilled = 0 THEN NULL
           ELSE ${proundSql("open_cnt * 100.0 / (total_orders - fulfilled)", 2)} END
        AS open_share_of_unfulfilled
    FROM (
      SELECT o_orderpriority,
        count(*) AS total_orders,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS fulfilled,
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt
      FROM orders GROUP BY o_orderpriority)
    ORDER BY o_orderpriority"""))

  // -- J4-J8: star-schema broadcast joins ------------------------------
  private val q04 = Q(
    "q04_star_broadcast",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("p_brand"), col("s_name"))
        .agg(
          count(lit(1)).as("n_lines"),
          moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
        .orderBy(col("p_brand"), col("s_name"))
    },
    Some(s"""SELECT p_brand, s_name, count(*) AS n_lines,
      ${moneySumSql("l_extendedprice * (1 - l_discount)")} AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY p_brand, s_name
    ORDER BY p_brand, s_name"""))

  // -- J9/J13: inner dim-chain joins -----------------------------------
  private val q05 = Q(
    "q05_region_year_revenue",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.region
        .join(t.nation, col("r_regionkey") === col("n_regionkey"))
        .join(t.customer, col("n_nationkey") === col("c_nationkey"))
        .join(t.orders, col("c_custkey") === col("o_custkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
        .agg(
          count(lit(1)).as("n_orders"),
          moneySum(col("o_totalprice")).as("revenue"))
        .orderBy(col("r_name"), col("order_year"))
    },
    Some(s"""SELECT r_name, year(o_orderdate) AS order_year,
      count(*) AS n_orders, ${moneySumSql("o_totalprice")} AS revenue
    FROM region
    JOIN nation ON r_regionkey = n_regionkey
    JOIN customer ON n_nationkey = c_nationkey
    JOIN orders ON c_custkey = o_custkey
    GROUP BY r_name, order_year
    ORDER BY r_name, order_year"""))

  // -- J1-J3: left join with cast in the join condition ----------------
  private val q06 = Q(
    "q06_left_join_cast_key",
    (s, dir) => {
      val t = Tpch(s, dir)
      val buildingCust = t.customer.filter(col("c_mktsegment") === "BUILDING")
      t.orders
        .join(
          broadcast(buildingCust),
          col("o_custkey").cast("string") === col("c_custkey").cast("string"),
          "left")
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("c_name").isNull, 1).otherwise(0)).as("n_unmatched"),
          sum(when(col("c_name").isNotNull, 1).otherwise(0)).as("n_matched"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS n_orders,
      CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched,
      CAST(sum(CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched
    FROM orders
    LEFT JOIN (SELECT * FROM customer WHERE c_mktsegment = 'BUILDING') c
      ON CAST(o_custkey AS VARCHAR) = CAST(c_custkey AS VARCHAR)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""))

  // -- J12: full outer join + key coalescing ---------------------------
  private val q07 = Q(
    "q07_full_outer_coalesce",
    (s, dir) => {
      val t = Tpch(s, dir)
      val orderStats = t.orders.filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_open_orders"),
          round(max(col("o_totalprice")), 2).as("max_open_price"))
      val custSide = t.customer
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select(col("c_custkey"), round(col("c_acctbal"), 2).as("acctbal"))
      orderStats
        .join(custSide, col("o_custkey") === col("c_custkey"), "full_outer")
        .select(
          coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          coalesce(col("n_open_orders"), lit(0L)).as("n_open_orders"),
          col("max_open_price"),
          col("acctbal"),
          (col("o_custkey").isNotNull && col("c_custkey").isNotNull).as("in_both"))
        .orderBy(col("custkey"))
    },
    Some("""SELECT coalesce(o_custkey, c_custkey) AS custkey,
      coalesce(n_open_orders, 0) AS n_open_orders,
      max_open_price, acctbal,
      (o_custkey IS NOT NULL AND c_custkey IS NOT NULL) AS in_both
    FROM (
      SELECT o_custkey, count(*) AS n_open_orders,
        round(max(o_totalprice), 2) AS max_open_price
      FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey) o
    FULL OUTER JOIN (
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')) c
      ON o_custkey = c_custkey
    ORDER BY custkey"""))

  // -- U1/A2: union + distinct (dim_airport build shape) ----------------
  private val q08 = Q(
    "q08_union_distinct",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.customer.select(col("c_nationkey").as("nationkey"))
        .unionByName(t.supplier.select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey"))
    },
    Some("""SELECT DISTINCT nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier)
    ORDER BY nationkey"""))

  // -- A9/O1: group-count + deterministic top-N -------------------------
  private val q09 = Q(
    "q09_top_parts",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.lineitem
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_lines"), round(sum(col("l_quantity")), 2).as("total_qty"))
        .orderBy(col("n_lines").desc, col("l_partkey").asc)
        .limit(10)
    },
    Some("""SELECT l_partkey, count(*) AS n_lines,
      round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_partkey
    ORDER BY n_lines DESC, l_partkey ASC
    LIMIT 10"""))

  // -- SURVEY §2.5: window top-N-per-group ------------------------------
  private val q10 = Q(
    "q10_topn_per_group",
    (s, dir) => {
      val t = Tpch(s, dir)
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t.orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("totalprice"))
        .orderBy(col("o_orderpriority"), col("rn"))
    },
    Some("""SELECT o_orderpriority, rn, o_orderkey, totalprice FROM (
      SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS totalprice,
        row_number() OVER (PARTITION BY o_orderpriority
          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders) WHERE rn <= 3
    ORDER BY o_orderpriority, rn"""))

  // -- P5-P8: compound predicates, null guards, boolean algebra ---------
  private val q11 = Q(
    "q11_filter_complex",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.lineitem
        .filter(
          (col("l_returnflag") === "R" || col("l_linestatus") === "F") &&
          col("l_quantity").between(5, 45) &&
          col("l_discount").isNotNull &&
          !(col("l_tax") > 0.07))
        .groupBy(year(col("l_shipdate")).as("ship_year"), month(col("l_shipdate")).as("ship_month"))
        .agg(count(lit(1)).as("n_lines"), round(sum(col("l_quantity")), 2).as("total_qty"))
        .orderBy(col("ship_year"), col("ship_month"))
    },
    Some("""SELECT year(l_shipdate) AS ship_year, month(l_shipdate) AS ship_month,
      count(*) AS n_lines, round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    WHERE (l_returnflag = 'R' OR l_linestatus = 'F')
      AND l_quantity BETWEEN 5 AND 45
      AND l_discount IS NOT NULL
      AND NOT (l_tax > 0.07)
    GROUP BY ship_year, ship_month
    ORDER BY ship_year, ship_month"""))

  // -- F1: ordered when/otherwise chain (delay-category shape,
  //    flight_data_enricher.py:13-40 first-match semantics) ------------
  private val q12 = Q(
    "q12_case_chain_categories",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.orders
        .withColumn("price_category",
          when(col("o_totalprice").isNull, "Unknown")
            .when(col("o_totalprice") < 1000, "Tiny")
            .when(col("o_totalprice") < 10000, "Small")
            .when(col("o_totalprice") < 50000, "Medium")
            .when(col("o_totalprice") < 100000, "Large")
            .otherwise("Huge"))
        .groupBy(col("price_category"))
        .agg(count(lit(1)).as("n_orders"),
          pround(dsum(col("o_totalprice")) / count(lit(1)), 2).as("avg_price"))
        .orderBy(col("price_category"))
    },
    Some(s"""SELECT
      CASE WHEN o_totalprice IS NULL THEN 'Unknown'
           WHEN o_totalprice < 1000 THEN 'Tiny'
           WHEN o_totalprice < 10000 THEN 'Small'
           WHEN o_totalprice < 50000 THEN 'Medium'
           WHEN o_totalprice < 100000 THEN 'Large'
           ELSE 'Huge' END AS price_category,
      count(*) AS n_orders,
      ${proundSql(s"${dsumSql("o_totalprice")} / count(*)", 2)} AS avg_price
    FROM orders
    GROUP BY price_category
    ORDER BY price_category"""))

  // -- F2-F5: trim/upper/concat/lpad/regexp_replace/substring -----------
  private val q13 = Q(
    "q13_string_funcs",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.part.select(
          col("p_partkey"),
          upper(trim(col("p_brand"))).as("brand_u"),
          concat(col("p_brand"), lit("-"), col("p_size").cast("string")).as("brand_size_code"),
          lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("name_masked"),
          substring(col("p_type"), 1, 5).as("type5"),
          length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey,
      upper(trim(p_brand)) AS brand_u,
      p_brand || '-' || CAST(p_size AS VARCHAR) AS brand_size_code,
      lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_masked,
      substring(p_type, 1, 5) AS type5,
      length(p_name) AS name_len
    FROM part ORDER BY p_partkey"""))

  // -- F7/F8: calendar extraction + yyyyMMdd int key (dim_date shape) ---
  private val q14 = Q(
    "q14_date_funcs",
    (s, dir) => {
      val t = Tpch(s, dir)
      t.orders
        .groupBy(
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"))
        .agg(
          count(lit(1)).as("n_orders"),
          // dayofweek: Spark is 1=Sunday; DuckDB dayofweek is 0=Sunday.
          sum(when(dayofweek(col("o_orderdate")).isin(1, 7), 1).otherwise(0)).as("n_weekend"),
          min(date_format(col("o_orderdate"), "yyyyMMdd").cast("int")).as("min_date_key"),
          countDistinct(weekofyear(col("o_orderdate"))).as("n_weeks"))
        .orderBy(col("y"), col("q"), col("m"))
    },
    Some("""SELECT year(o_orderdate) AS y, quarter(o_orderdate) AS q,
      month(o_orderdate) AS m,
      count(*) AS n_orders,
      CAST(sum(CASE WHEN (dayofweek(o_orderdate) + 1) IN (1, 7) THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
      min(CAST(strftime(o_orderdate, '%Y%m%d') AS INT)) AS min_date_key,
      count(DISTINCT weekofyear(o_orderdate)) AS n_weeks
    FROM orders
    GROUP BY y, q, m
    ORDER BY y, q, m"""))

  // -- G1: date-spine generator (dim_date.py:8-33) ----------------------
  private val q15 = Q(
    "q15_date_spine",
    (s, dir) => {
      s.sql("""SELECT explode(sequence(to_date('2024-01-01'), to_date('2024-12-31'),
                 interval 1 day)) AS full_date""")
        .select(
          col("full_date"),
          date_format(col("full_date"), "yyyyMMdd").cast("int").as("date_key"),
          year(col("full_date")).as("y"),
          quarter(col("full_date")).as("q"),
          month(col("full_date")).as("m"),
          dayofmonth(col("full_date")).as("d"),
          date_format(col("full_date"), "MMM").as("month_abbr"),
          date_format(col("full_date"), "EEEE").as("day_name"),
          dayofweek(col("full_date")).isin(1, 7).as("is_weekend"))
        .orderBy(col("full_date"))
    },
    Some("""SELECT full_date,
      CAST(strftime(full_date, '%Y%m%d') AS INT) AS date_key,
      year(full_date) AS y, quarter(full_date) AS q, month(full_date) AS m,
      day(full_date) AS d,
      strftime(full_date, '%b') AS month_abbr,
      strftime(full_date, '%A') AS day_name,
      (dayofweek(full_date) + 1) IN (1, 7) AS is_weekend
    FROM (SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-12-31',
            INTERVAL 1 DAY)) AS DATE) AS full_date)
    ORDER BY full_date"""))

  // -- G2: minute-spine generator (dim_time.py:9-91) ---------------------
  private val q16 = Q(
    "q16_time_spine",
    (s, dir) => {
      s.range(0, 1440).toDF("minute_of_day")
        .select(
          col("minute_of_day"),
          expr("minute_of_day div 60").as("hh"),
          expr("minute_of_day % 60").as("mm"))
        .select(
          col("minute_of_day"), col("hh"), col("mm"),
          concat(lpad(col("hh").cast("string"), 2, "0"), lit(":"),
            lpad(col("mm").cast("string"), 2, "0")).as("time_string"),
          when(col("hh") < 12, "AM").otherwise("PM").as("ampm"),
          when(col("hh") === 0, 12)
            .when(col("hh") > 12, col("hh") - 12)
            .otherwise(col("hh")).as("hour12"),
          when(col("hh") < 6, "Night")
            .when(col("hh") < 12, "Morning")
            .when(col("hh") < 18, "Afternoon")
            .otherwise("Evening").as("time_of_day"))
        .orderBy(col("minute_of_day"))
    },
    Some("""SELECT minute_of_day,
      minute_of_day // 60 AS hh,
      minute_of_day % 60 AS mm,
      lpad(CAST(minute_of_day // 60 AS VARCHAR), 2, '0') || ':' ||
        lpad(CAST(minute_of_day % 60 AS VARCHAR), 2, '0') AS time_string,
      CASE WHEN minute_of_day // 60 < 12 THEN 'AM' ELSE 'PM' END AS ampm,
      CASE WHEN minute_of_day // 60 = 0 THEN 12
           WHEN minute_of_day // 60 > 12 THEN minute_of_day // 60 - 12
           ELSE minute_of_day // 60 END AS hour12,
      CASE WHEN minute_of_day // 60 < 6 THEN 'Night'
           WHEN minute_of_day // 60 < 12 THEN 'Morning'
           WHEN minute_of_day // 60 < 18 THEN 'Afternoon'
           ELSE 'Evening' END AS time_of_day
    FROM range(0, 1440) t(minute_of_day)
    ORDER BY minute_of_day"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08,
    q09, q10, q11, q12, q13, q14, q15, q16)
}
