package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.{t, cents, revenueC4}

/** Generic relational operator inventory (SURVEY §2.3 "generic surface"):
  * scans, projection/filter, equi/semi/anti/broadcast joins, hash aggs,
  * rollup/cube, windows, sort/limit, set ops, string/date/math/array/map/
  * json scalars — each with a DuckDB oracle over the same parquet tables.
  *
  * Numeric discipline: aggregates run over exact integer cents (see
  * graft.Tables) so Spark and DuckDB agree bit-for-bit; derived integers
  * are cast to LONG on the Spark side because DuckDB scalar functions
  * return BIGINT.
  */
object Relational {

  type QFn = (SparkSession, String) => DataFrame

  val queries: Map[String, QFn] = Map(
    // ---- aggregation ----
    "q1_pricing" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_base_c"),
          sum(revenueC4(col("l_extendedprice"), col("l_discount"))).as("sum_disc_c4"),
          avg(cents(col("l_quantity"))).as("avg_qty_c"),
          count(lit(1)).as("n_rows"))
    }),

    "agg_global" -> ((s, d) => {
      t(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        sum(cents(col("l_extendedprice"))).as("sum_px_c"),
        unix_micros(min(col("l_shipdate")).cast("timestamp")).as("min_ship_us"),
        unix_micros(max(col("l_shipdate")).cast("timestamp")).as("max_ship_us"))
    }),

    // Three exact distincts per group. NOT one agg with three
    // countDistinct calls — Catalyst plans that as a 4x Expand of the
    // whole scan (every input row replicated per distinct aggregate);
    // distinct-first two-phase per target collapses duplicates in the
    // map-side partial instead, and the three 3-row results join on
    // the group key for free (measured 2.0 s -> ~0.6 s at sf0.1; at
    // 100 TB the Expand version quadruples the shuffle).
    "agg_countdistinct" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      def dcount(name: String, keys: Column*) =
        // NULL parity with countDistinct: count(DISTINCT a, b) skips
        // rows with ANY null arg, but count(1)-after-distinct would
        // count a null tuple as a value — filter them out first
        // (no-op on TPC-H keys, which are non-null)
        li.select(col("l_returnflag") +: keys: _*)
          .filter(keys.map(_.isNotNull).reduce(_ && _))
          .distinct()
          .groupBy("l_returnflag").agg(count(lit(1)).as(name))
      dcount("n_parts", col("l_partkey"))
        .join(dcount("n_supps", col("l_suppkey")), "l_returnflag")
        .join(dcount("n_part_supp", col("l_partkey"), col("l_suppkey")),
          "l_returnflag")
    }),

    "agg_rollup" -> ((s, d) => {
      // SQL surface: the Dataset API's ambiguous-self-join guard
      // false-positives on rollup-after-join in Spark 4.
      t(s, d, "customer").createOrReplaceTempView("customer_v")
      t(s, d, "nation").createOrReplaceTempView("nation_v")
      t(s, d, "region").createOrReplaceTempView("region_v")
      s.sql("""
        SELECT r_name, n_name, COUNT(1) AS n_cust,
               SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_bal_c
        FROM customer_v
        JOIN nation_v ON c_nationkey = n_nationkey
        JOIN region_v ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
      """)
    }),

    "agg_cube" -> ((s, d) => {
      t(s, d, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("sum_px_c"))
    }),

    // ---- joins ----
    "join_q3_revenue" -> ((s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
        .agg(sum(revenueC4(col("l_extendedprice"), col("l_discount"))).as("revenue_c4"))
    }),

    "join_broadcast_part" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val part = t(s, d, "part")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy("p_brand")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          count(lit(1)).as("n_items"))
    }),

    "join_left_count" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"))
    }),

    "join_semi" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val bigOrders = t(s, d, "orders").filter(col("o_totalprice") > 400000)
      cust.join(bigOrders, cust("c_custkey") === bigOrders("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    "join_anti" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey").cast("long").as("c_nationkey"))
    }),

    "join_q5_region" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val sup = t(s, d, "supplier")
      val nat = t(s, d, "nation")
      val reg = t(s, d, "region")
      // TPC-H Q5 shape: customer and supplier in the same nation.
      cust.join(ord, cust("c_custkey") === ord("o_custkey"))
        .join(li, ord("o_orderkey") === li("l_orderkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey") &&
          cust("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          sum(revenueC4(col("l_extendedprice"), col("l_discount"))).as("revenue_c4"),
          count(lit(1)).as("n_items"))
    }),

    // ---- windows ----
    "win_top_order_per_cust" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("top_px_c"))
    }),

    "win_running_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          sum(cents(col("value"))).over(w).as("run_value_c"))
    }),

    "win_lag_gap" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
    }),

    "win_sessionize" -> ((s, d) => {
      // Gaps-and-islands (SURVEY O11 pattern on the events table):
      // a new session starts after a >30 min silence per user.
      val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val ev = t(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(byUser))
        .withColumn("is_new", when(col("gap").isNull || col("gap") > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          min(col("us")).as("start_us"),
          max(col("us")).as("end_us"),
          sum(cents(col("value"))).as("sum_value_c"))
    }),

    // ---- sort / limit / top-k ----
    "topk_orders" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)
        .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("px_c"))
    }),

    // ---- distinct / set ops ----
    "distinct_pairs" -> ((s, d) =>
      t(s, d, "lineitem").select("l_returnflag", "l_linestatus").distinct()),

    "setop_intersect" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val b = t(s, d, "orders").filter(col("o_totalprice") > 300000)
        .select(col("o_custkey").as("c_custkey"))
      a.intersect(b)
    }),

    "setop_except" -> ((s, d) => {
      val a = t(s, d, "customer").select(col("c_custkey"))
      val b = t(s, d, "orders").select(col("o_custkey").as("c_custkey"))
      a.except(b)
    }),

    "setop_union" -> ((s, d) => {
      val a = t(s, d, "customer").filter(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("k"), lit("rich").as("tag"))
      val b = t(s, d, "customer").filter(col("c_acctbal") < -500)
        .select(col("c_custkey").as("k"), lit("poor").as("tag"))
      a.union(b).groupBy("tag").agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
    }),

    // ---- scalar function families ----
    "str_funcs" -> ((s, d) => {
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("name_up"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 3).as("name3"),
        replace(col("p_name"), lit(" "), lit("_")).as("name_us"))
    }),

    "date_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mon"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("sum_px_c"))
    }),

    "date_trunc_week" -> ((s, d) => {
      t(s, d, "events")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
    }),

    "math_funcs" -> ((s, d) => {
      t(s, d, "lineitem").filter(col("l_orderkey") < 200).select(
        col("l_orderkey"), col("l_linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_px"),
        round(log(col("l_extendedprice") + 1), 6).as("ln_px"),
        round(pow(col("l_discount"), 2), 6).as("disc_sq"),
        abs(cents(col("l_extendedprice")) - 5000000L).as("abs_c"),
        floor(col("l_extendedprice")).cast("long").as("floor_px"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_px"),
        (cents(col("l_extendedprice")) % 97L).as("mod97"))
    }),

    "arr_funcs" -> ((s, d) => {
      val words = split(col("p_name"), " ")
      t(s, d, "part").select(
        col("p_partkey"),
        size(words).cast("long").as("n_words"),
        element_at(words, 1).as("w1"),
        array_join(array_sort(words), ",").as("sorted_words"),
        array_contains(words, "red").as("has_red"))
    }),

    "json_funcs" -> ((s, d) => {
      t(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // Spark 4 VARIANT ingestion: parse the JSON once into the binary
    // variant encoding, then typed-path extraction (`variant_get`) —
    // at 100 TB the parse cost is paid once at ingest and every later
    // field access is a binary offset lookup, not a re-parse; this is
    // the semi-structured path shredded scans build on.
    "json_variant" -> ((s, d) =>
      t(s, d, "events")
        .withColumn("v", parse_json(col("props")))
        .select(col("event_type"),
          variant_get(col("v"), "$.k", "long").as("k"))
        .groupBy(expr("k div 10").as("k_decade"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          countDistinct(col("event_type")).as("n_types"))),

    "case_when_bucket" -> ((s, d) => {
      t(s, d, "orders")
        .withColumn("bucket",
          when(col("o_totalprice") < 100000, "S")
            .when(col("o_totalprice") < 300000, "M")
            .otherwise("L"))
        .groupBy("o_orderstatus", "bucket")
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_px_c"))
    }),

    // ---- subqueries (SQL surface) ----
    "subquery_above_avg" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders_v")
      s.sql("""
        SELECT o_orderstatus,
               COUNT(1) AS n_above,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sum_px_c
        FROM orders_v
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders_v)
        GROUP BY o_orderstatus
      """)
    }),

    "pivot_returnflag" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(cents(col("l_quantity"))))
    }),

    // Multi-aggregate pivot: each pivot value explodes into one column
    // PER aggregate (value_aggname suffixing) — still one Expand +
    // hash-agg pass, the column explosion is purely logical.
    "pivot_multi" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N"))
        .agg(sum(cents(col("l_quantity"))).as("sum_qty_c"),
          count(lit(1)).as("n"))
    })
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS sum_disc_c4,
        |  AVG(CAST(ROUND(l_quantity*100) AS BIGINT)) AS avg_qty_c,
        |  COUNT(1) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "agg_global" ->
      """SELECT COUNT(1) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_px_c,
        |  epoch_us(MIN(l_shipdate)) AS min_ship_us, epoch_us(MAX(l_shipdate)) AS max_ship_us
        |FROM lineitem""".stripMargin,

    "agg_countdistinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "agg_rollup" ->
      """SELECT r_name, n_name, COUNT(1) AS n_cust,
        |  CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_bal_c
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,

    "agg_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_px_c
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "join_q3_revenue" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2""".stripMargin,

    "join_broadcast_part" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  COUNT(1) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin,

    "join_left_count" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)""".stripMargin,

    "join_anti" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "join_q5_region" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT) * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_c4,
        |  COUNT(1) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "win_top_order_per_cust" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS top_px_c
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn FROM orders)
        |WHERE rn = 1""".stripMargin,

    "win_running_sum" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_value_c
        |FROM events""".stripMargin,

    "win_lag_gap" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
        |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
        |FROM events""".stripMargin,

    "win_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
        |    epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w AS gap
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), s AS (
        |  SELECT *, CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY us ASC, event_id ASC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, COUNT(1) AS n_events,
        |  MIN(us) AS start_us, MAX(us) AS end_us,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM s GROUP BY user_id, session_id""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, CAST(ROUND(o_totalprice*100) AS BIGINT) AS px_c
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,

    "distinct_pairs" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "setop_intersect" ->
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 300000""".stripMargin,

    "setop_except" ->
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS c_custkey FROM orders""".stripMargin,

    "setop_union" ->
      """SELECT tag, COUNT(1) AS n, CAST(SUM(k) AS BIGINT) AS sum_k FROM (
        |  SELECT c_custkey AS k, 'rich' AS tag FROM customer WHERE c_acctbal > 9000
        |  UNION ALL
        |  SELECT c_custkey AS k, 'poor' AS tag FROM customer WHERE c_acctbal < -500
        |) GROUP BY tag""".stripMargin,

    "str_funcs" ->
      """SELECT p_partkey,
        |  UPPER(p_name) AS name_up,
        |  CAST(LENGTH(p_name) AS BIGINT) AS name_len,
        |  COALESCE(regexp_extract(p_name, '^(\w+)', 1), '') AS first_word,
        |  p_brand || '|' || p_type AS brand_type,
        |  SUBSTRING(p_name, 1, 3) AS name3,
        |  REPLACE(p_name, ' ', '_') AS name_us
        |FROM part""".stripMargin,

    "date_funcs" ->
      """SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
        |  CAST(MONTH(o_orderdate) AS BIGINT) AS mon,
        |  COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_px_c
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "date_trunc_week" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type, COUNT(1) AS n,
        |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1, 2""".stripMargin,

    "math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(SQRT(l_extendedprice), 6) AS sqrt_px,
        |  ROUND(LN(l_extendedprice + 1), 6) AS ln_px,
        |  ROUND(POW(l_discount, 2), 6) AS disc_sq,
        |  ABS(CAST(ROUND(l_extendedprice*100) AS BIGINT) - 5000000) AS abs_c,
        |  CAST(FLOOR(l_extendedprice) AS BIGINT) AS floor_px,
        |  CAST(CEIL(l_extendedprice) AS BIGINT) AS ceil_px,
        |  CAST(ROUND(l_extendedprice*100) AS BIGINT) % 97 AS mod97
        |FROM lineitem WHERE l_orderkey < 200""".stripMargin,

    "arr_funcs" ->
      """SELECT p_partkey,
        |  CAST(LENGTH(string_split(p_name, ' ')) AS BIGINT) AS n_words,
        |  string_split(p_name, ' ')[1] AS w1,
        |  array_to_string(list_sort(string_split(p_name, ' ')), ',') AS sorted_words,
        |  list_contains(string_split(p_name, ' '), 'red') AS has_red
        |FROM part""".stripMargin,

    "json_funcs" ->
      """SELECT event_type, COUNT(1) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,

    "json_variant" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10 AS k_decade,
        |  COUNT(1) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM events
        |GROUP BY k_decade""".stripMargin,

    "case_when_bucket" ->
      """SELECT o_orderstatus,
        |  CASE WHEN o_totalprice < 100000 THEN 'S'
        |       WHEN o_totalprice < 300000 THEN 'M'
        |       ELSE 'L' END AS bucket,
        |  COUNT(1) AS n,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_px_c
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "subquery_above_avg" ->
      """SELECT o_orderstatus, COUNT(1) AS n_above,
        |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_px_c
        |FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        |GROUP BY o_orderstatus""".stripMargin,

    "pivot_returnflag" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(ROUND(l_quantity*100) AS BIGINT) END) AS BIGINT) AS "A",
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(ROUND(l_quantity*100) AS BIGINT) END) AS BIGINT) AS "N",
        |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(ROUND(l_quantity*100) AS BIGINT) END) AS BIGINT) AS "R"
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "pivot_multi" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(ROUND(l_quantity*100) AS BIGINT) END) AS BIGINT) AS "A_sum_qty_c",
        |  CAST(COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS BIGINT) AS "A_n",
        |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(ROUND(l_quantity*100) AS BIGINT) END) AS BIGINT) AS "N_sum_qty_c",
        |  CAST(COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS BIGINT) AS "N_n"
        |FROM lineitem GROUP BY l_linestatus""".stripMargin
  )
}
