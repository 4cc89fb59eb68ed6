package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import QueryUtil._

/** Relational capability battery — joins, grouped/rollup aggregation,
  * window functions, sessionization. Absent from the reference
  * (SURVEY.md §2.12); required by the north star for a complete engine.
  *
  * Scale notes per query are inline: broadcast hints where one side is a
  * dimension table, exact-integer money math, and single-shuffle window
  * shapes.
  */
object RelQueries {

  import RefQueries.QueryFn

  val queries: Map[String, QueryFn] = Map(
    // Set operators (absent from the reference, SURVEY.md §2.12):
    // INTERSECT/EXCEPT with DISTINCT semantics — Spark plans each as a
    // left-semi/anti hash join over pre-distinct inputs; keys are the
    // only shuffled payload.
    "q_intersect" -> ((s, dir) => {
      val ord = table(s, dir, "orders")
      ord.where(year(col("o_orderdate")) === 1995).select("o_custkey")
        .intersect(
          ord.where(year(col("o_orderdate")) === 1996).select("o_custkey"))
        .orderBy("o_custkey")
    }),

    "q_except" -> ((s, dir) => {
      val ord = table(s, dir, "orders")
      ord.where(year(col("o_orderdate")) === 1995).select("o_custkey")
        .except(
          ord.where(year(col("o_orderdate")) === 1996).select("o_custkey"))
        .orderBy("o_custkey")
    }),

    // Navigation/distribution window functions over one (customer, date)
    // sort: lag/lead/ntile/percent_rank share a single window frame —
    // one hash shuffle + one sort, every function evaluated in the same
    // pass. Integer keys only (no float money), deterministic tie-break
    // by o_orderkey.
    "q_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      table(s, dir, "orders")
        .where(col("o_custkey") < 50)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          lead(col("o_orderkey"), 1).over(w).as("next_key"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("prank"),
          row_number().over(w).cast("long").as("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // TPC-H Q1 shape: single scan → partial+final hash agg (one shuffle on
    // the 6-value grouping key), all money math in exact cents.
    "q1_agg" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val epc = cents(col("l_extendedprice"))
      val dc = cents(col("l_discount"))   // discount*100 as int (0..10)
      val tc = cents(col("l_tax"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(wholeUnits(col("l_quantity"))).as("sum_qty"),
          (sum(epc) / 100.0).as("sum_base_price"),
          (sum(epc * (lit(100) - dc)) / 10000.0).as("sum_disc_price"),
          (sum(epc * (lit(100) - dc) * (lit(100) + tc)) / 1000000.0).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3 shape: dimension-filtered customer (small) broadcast into
    // orders, then join lineitem; revenue ranked top-10 deterministically.
    "q3_topk" -> ((s, dir) => {
      val cust = table(s, dir, "customer")
        .where(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      // to_timestamp evaluates under the UTC session zone — a
      // java.sql.Timestamp literal would bind the JVM default zone and
      // diverge from the oracle's naive TIMESTAMP on non-UTC machines
      val ord = table(s, dir, "orders")
        .where(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"),
          revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev_u"))
      // Only the filtered dimension (customer) is broadcast-safe: the date
      // filter keeps ~97% of orders, so orders⋈customer is NOT small at
      // scale — no hint on the outer join; AQE picks shuffle-hash/sort-merge
      // for lineitem⋈orders (or a runtime broadcast if stats allow).
      li.join(ord.join(broadcast(cust),
            col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg((sum(col("rev_u")) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // Broadcast hash join: part is a dimension table → no shuffle of the
    // fact side beyond the final agg.
    "q_broadcast_join" -> ((s, dir) => {
      val li = table(s, dir, "lineitem")
      val p = table(s, dir, "part").select("p_partkey", "p_brand")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
             sum(wholeUnits(col("l_quantity"))).as("sum_qty"))
        .orderBy("p_brand")
    }),

    // Left-anti join (NOT EXISTS): customers with no high-value order.
    "q_anti_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
        .where(col("o_totalprice") > 450000.0).select("o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Left-semi join (EXISTS): customers with at least one open order.
    "q_semi_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders")
        .where(col("o_orderstatus") === "O").select("o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // Window top-k per group: one hash shuffle on the partition key, sort
    // within partitions, early filter on rank. Customer is unfiltered here,
    // so the join is hint-free — AQE broadcasts it when it is actually
    // small, and falls back to shuffle join when the "dimension" grows.
    "q_window_topk" -> ((s, dir) => {
      val c = table(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val o = table(s, dir, "orders")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.join(c, col("o_custkey") === col("c_custkey"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("c_mktsegment"), col("rk").cast("long").as("rk"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("c_mktsegment", "rk")
    }),

    // Rollup aggregation (grouping-sets family).
    "q_rollup" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
             sum(wholeUnits(col("l_quantity"))).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    }),

    // Cube (full grouping-sets lattice) with grouping_id to tell rollup
    // nulls from data nulls.
    "q_cube" -> ((s, dir) => {
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("y"))
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"),
          (sum(cents(col("o_totalprice"))) / 100.0).as("sum_price"))
        .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
          asc_nulls_first("y"))
        .select("gid", "o_orderstatus", "y", "n", "sum_price")
    }),

    // Tumbling-window aggregate over the event stream (batch form; the
    // streaming form is graft.streaming with the same grouping).
    "q_hourly_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             (sum(cents(col("value"))) / 100.0).as("sum_value"))
        .orderBy("hour", "event_type")
    }),

    // String-function surface: case, trim, substring, replace, padding,
    // reverse — one projection, all codegen builtins.
    "q_string_funcs" -> ((s, dir) => {
      table(s, dir, "customer").select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_mktsegment")).as("lo"),
        substring(col("c_name"), 1, 8).as("sub"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        reverse(col("c_name")).as("rev"),
        length(col("c_name")).cast("long").as("len"))
        .orderBy("c_custkey")
    }),

    // Date/time-function surface over order timestamps.
    "q_date_parts" -> ((s, dir) => {
      table(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"))
        .agg(count(lit(1)).as("n"),
          countDistinct(dayofmonth(col("o_orderdate"))).as("n_days"))
        .orderBy("y", "m")
    }),

    // Exact interpolated percentiles (sort-based agg); both engines use
    // the same linear-interpolation definition over the same integer-
    // valued doubles.
    "q_percentile" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.9)").as("p90_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // HLL sketch distinct (approx_count_distinct). The sketch value is
    // engine-specific, so the oracle-comparable output is the exact
    // distinct count plus a tolerance assertion the approx must satisfy:
    // DuckDB computes the same exact count and literal TRUE, making the
    // row hash-exact while still exercising the HLL operator.
    "q_approx_distinct" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), col("exact_parts"), col("n"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double") /
            col("exact_parts") < 0.05).as("within_tol"))
        .orderBy("l_returnflag")
    }),

    // Distinct aggregation (Expand-based distinct-agg operator).
    "q_distinct_agg" -> ((s, dir) => {
      events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type")
    }),

    // Gap-based sessionization: lag + cumulative sum over one
    // (user-partitioned) window — a single shuffle on user_id, integer
    // microsecond math for exactness. 30-minute inactivity gap.
    // RANGE-frame rolling window: per-customer 7-day rolling order
    // revenue — the frame is value-based (day numbers), so ties and
    // gaps behave like real time-series analytics, not row counting.
    "q_rolling_sum" -> ((s, dir) => {
      val day = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-6, 0)
      table(s, dir, "orders")
        .where(col("o_custkey") <= 500)
        .select(col("o_orderkey"), col("o_custkey"), day.as("day"),
          cents(col("o_totalprice")).as("price_c"))
        .withColumn("rolling_7d",
          (sum(col("price_c")).over(w) / 100.0))
        .select("o_orderkey", "o_custkey", "day", "rolling_7d")
        .orderBy("o_custkey", "day", "o_orderkey")
    }),

    // Sketch quantile (approx_percentile): same oracle trick as
    // q_approx_distinct — the sketch value is engine-specific, so the
    // comparable output is the exact interpolated percentile plus a
    // tolerance boolean the sketch must satisfy.
    "q_approx_quantile" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
            .as("approx_med"),
          expr("percentile(l_quantity, 0.5)").as("exact_med"))
        .select(col("l_returnflag"), col("exact_med"),
          (abs(col("approx_med") - col("exact_med")) <= 1.0).as("within_tol"))
        .orderBy("l_returnflag")
    }),

    // Correlation WITHOUT float-order sensitivity: the five sufficient
    // statistics are exact integer sums, and the double formula is
    // evaluated with identical structure on both engines — bit-exact,
    // unlike corr() whose internal accumulation order differs per
    // engine. Prices are in hundred-dollar units so the SUM of squares
    // (not just one square) stays inside long range out to extreme
    // scale: max price² ≈ 1.1e6 × even 10^12 rows < 2^63.
    "q_corr" -> ((s, dir) => {
      // floor on both measures, not cast: Spark's double->long cast
      // truncates while DuckDB's ::BIGINT rounds
      val qty = floor(col("l_quantity")).cast("long")
      val price = floor(col("l_extendedprice") / 100).cast("long")
      val stats = table(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(qty).as("sx"), sum(price).as("sy"),
          sum(qty * price).as("sxy"), sum(qty * qty).as("sxx"),
          sum(price * price).as("syy"))
      val d = (c: String) => col(c).cast("double")
      stats.select(col("l_returnflag"), col("n"),
        ((d("n") * d("sxy") - d("sx") * d("sy")) /
          sqrt((d("n") * d("sxx") - d("sx") * d("sx")) *
            (d("n") * d("syy") - d("sy") * d("sy")))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q5 shape: 6-table snowflake with the c_nationkey =
    // s_nationkey local-supplier condition. Join ORDER is load-bearing
    // and hand-chosen (Catalyst does not reorder joins without CBO, and
    // AQE changes strategies, never order): facts chain first
    // (cust→orders→lineitem — each join is key-selective), supplier
    // attaches on BOTH its conditions at once, and the tiny
    // nation/region dims come last. Joining supplier⋈customer on
    // nationkey alone first would pair every same-nation (supplier,
    // customer) — a quadratic intermediate at scale.
    "q5_region_revenue" -> ((s, dir) => {
      val region = table(s, dir, "region").where(col("r_name") === "ASIA")
        .select("r_regionkey")
      val nation = table(s, dir, "nation")
        .select("n_nationkey", "n_regionkey", "n_name")
      val cust = table(s, dir, "customer").select("c_custkey", "c_nationkey")
      val supp = table(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      val ord = table(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01") &&
          col("o_orderdate") < lit("1997-01-01"))
        .select("o_orderkey", "o_custkey")
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"),
          revenueUnits(col("l_extendedprice"), col("l_discount")).as("rev_u"))
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("s_nationkey") === col("c_nationkey"))
        .join(nation, col("n_nationkey") === col("s_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg((sum(col("rev_u")) / 10000.0).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Unpivot (melt): wide lineitem measures to (measure, value) rows —
    // integer cents so the stacked doubles stay oracle-exact.
    "q_unpivot" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .where(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("ln"),
          cents(col("l_extendedprice")).as("price_c"),
          cents(col("l_discount")).as("discount_c"),
          cents(col("l_tax")).as("tax_c"))
        .unpivot(Array(col("l_orderkey"), col("ln")),
          Array(col("price_c"), col("discount_c"), col("tax_c")),
          "measure", "value_c")
        .orderBy("l_orderkey", "ln", "measure")
    }),

    // Pivot: event counts per hour-of-day, one column per event type.
    // Spark's pivot yields NULL for empty cells while the oracle's
    // FILTER count yields 0 — coalesce pins the semantics to 0.
    "q_pivot" -> ((s, dir) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = events(s, dir)
        .groupBy(hour(col("ts")).cast("long").as("hod"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("hod") +:
          types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy("hod")
    }),

    // Semi-structured surface: JSON property extraction from the event
    // props column (get_json_object — per-row, codegen'd), aggregated
    // per event type.
    "q_json_extract" -> ((s, dir) => {
      events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_with_k"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // As-of join composed as union + ONE window (ops.AsofJoin): for each
    // view event, the latest purchase by the same user at or before it.
    // One key shuffle + sort — never an inequality join.
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir).withColumn("ts_us", unix_micros(col("ts")))
      val views = ev.where(col("event_type") === "view")
        .select("event_id", "user_id", "ts_us")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("purchase_id"),
          col("value").as("purchase_value"))
      graft.ops.AsofJoin.asof(views, purchases, "user_id", "ts_us",
        Seq("purchase_id", "purchase_value"), tieBreak = "purchase_id")
        .orderBy("event_id")
    }),

    // Range join via bucketed equi-join (ops.RangeJoin): global
    // lineitems shipped within each cohort order's first week — a hash
    // shuffle on week-buckets + exact refine, where the naive inequality
    // join would plan as broadcast nested-loop. The interval side is a
    // deterministic 1% hash cohort: every order's week overlaps ~0.3% of
    // ALL lineitems, so an unrestricted interval set makes the join's
    // OUTPUT itself quadratic in scale — the cohort bounds output while
    // the technique stays identical.
    "q_range_join" -> ((s, dir) => {
      val dayNo = (c: org.apache.spark.sql.Column) =>
        datediff(c, lit("1970-01-01")).cast("long")
      val li = table(s, dir, "lineitem")
        .select(dayNo(col("l_shipdate")).as("ship_day"))
      val ord = table(s, dir, "orders")
        .where(graft.functions.Hashing.h32(
          concat(lit("rj|"), col("o_orderkey").cast("string"))) % 100 === 0)
        .select(col("o_orderkey"), dayNo(col("o_orderdate")).as("lo"))
        .withColumn("hi", col("lo") + 7)
      graft.ops.RangeJoin.pointInInterval(li, "ship_day", ord,
        "lo", "hi", width = 7)
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_shipped"))
        .orderBy("o_orderkey")
    }),

    "q_sessionize" -> ((s, dir) => {
      val ev = events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts")))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val gapUs = 1800L * 1000000L
      ev.withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
               col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
             min(col("ts_us")).as("start_us"),
             max(col("ts_us")).as("end_us"))
        .orderBy("user_id", "session_idx")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS prank,
        |  row_number() OVER w AS rn
        |FROM orders WHERE o_custkey < 50
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity::BIGINT)::BIGINT AS sum_qty,
        |  sum(round(l_extendedprice*100)::BIGINT) / 100.0 AS sum_base_price,
        |  sum(round(l_extendedprice*100)::BIGINT
        |      * (100 - round(l_discount*100)::BIGINT)) / 10000.0 AS sum_disc_price,
        |  sum(round(l_extendedprice*100)::BIGINT
        |      * (100 - round(l_discount*100)::BIGINT)
        |      * (100 + round(l_tax*100)::BIGINT)) / 1000000.0 AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q3_topk" ->
      """SELECT o_orderkey, o_orderdate,
        |  sum(round(l_extendedprice*100)::BIGINT
        |      * (100 - round(l_discount*100)::BIGINT)) / 10000.0 AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_broadcast_join" ->
      """SELECT p_brand, count(*) AS n_items, sum(l_quantity::BIGINT)::BIGINT AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin,

    "q_window_topk" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  sum(l_quantity::BIGINT)::BIGINT AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_cube" ->
      """SELECT grouping(o_orderstatus, y)::BIGINT AS gid,
        |  o_orderstatus, y, count(*) AS n,
        |  sum(round(o_totalprice*100)::BIGINT) / 100.0 AS sum_price
        |FROM (SELECT o_orderstatus, year(o_orderdate)::BIGINT AS y,
        |        o_totalprice FROM orders)
        |GROUP BY CUBE (o_orderstatus, y)
        |ORDER BY gid, o_orderstatus ASC NULLS FIRST, y ASC NULLS FIRST""".stripMargin,

    "q_hourly_agg" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP)::TIMESTAMP AS hour, event_type, count(*) AS n,
        |  sum(round(value*100)::BIGINT) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.9) AS p90_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_name) AS up, lower(c_mktsegment) AS lo,
        |  substr(c_name, 1, 8) AS sub,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  lpad(c_custkey::VARCHAR, 8, '0') AS padded,
        |  reverse(c_name) AS rev,
        |  length(c_name)::BIGINT AS len
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_date_parts" ->
      """SELECT year(o_orderdate)::BIGINT AS y, month(o_orderdate)::BIGINT AS m,
        |  count(*) AS n,
        |  count(DISTINCT day(o_orderdate))::BIGINT AS n_days
        |FROM orders GROUP BY 1, 2 ORDER BY y, m""".stripMargin,

    "q_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey)::BIGINT AS exact_parts,
        |  count(*) AS n,
        |  true AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_distinct_agg" ->
      """SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_rolling_sum" ->
      """SELECT o_orderkey, o_custkey,
        |  date_diff('day', DATE '1970-01-01', o_orderdate::DATE)::BIGINT AS day,
        |  sum(round(o_totalprice*100)::BIGINT) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate::DATE)
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT / 100.0
        |    AS rolling_7d
        |FROM orders WHERE o_custkey <= 500
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin,

    "q_approx_quantile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS exact_med,
        |  true AS within_tol
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    floor(l_quantity)::BIGINT AS q,
        |    floor(l_extendedprice / 100)::BIGINT AS p
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(q)::BIGINT AS sx, sum(p)::BIGINT AS sy,
        |    sum(q * p)::BIGINT AS sxy,
        |    sum(q * q)::BIGINT AS sxx, sum(p * p)::BIGINT AS syy
        |  FROM m GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) /
        |    sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) *
        |         (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))
        |    AS corr_qty_price
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q5_region_revenue" ->
      """SELECT n_name,
        |  sum(round(l_extendedprice*100)::BIGINT
        |      * (100 - round(l_discount*100)::BIGINT))::BIGINT / 10000.0
        |    AS revenue
        |FROM region, nation, supplier, customer, orders, lineitem
        |WHERE r_name = 'ASIA' AND n_regionkey = r_regionkey
        |  AND s_nationkey = n_nationkey AND c_nationkey = s_nationkey
        |  AND o_custkey = c_custkey
        |  AND o_orderdate >= '1996-01-01' AND o_orderdate < '1997-01-01'
        |  AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_unpivot" ->
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber::BIGINT AS ln,
        |    round(l_extendedprice*100)::BIGINT AS price_c,
        |    round(l_discount*100)::BIGINT AS discount_c,
        |    round(l_tax*100)::BIGINT AS tax_c
        |  FROM lineitem WHERE l_orderkey <= 100)
        |SELECT l_orderkey, ln, measure, value_c FROM (
        |  SELECT l_orderkey, ln, 'price_c' AS measure, price_c AS value_c FROM base
        |  UNION ALL
        |  SELECT l_orderkey, ln, 'discount_c', discount_c FROM base
        |  UNION ALL
        |  SELECT l_orderkey, ln, 'tax_c', tax_c FROM base)
        |ORDER BY l_orderkey, ln, measure""".stripMargin,

    "q_pivot" ->
      """SELECT hour(ts::TIMESTAMP)::BIGINT AS hod,
        |  count(*) FILTER (event_type = 'click') AS n_click,
        |  count(*) FILTER (event_type = 'error') AS n_error,
        |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (event_type = 'signup') AS n_signup,
        |  count(*) FILTER (event_type = 'view') AS n_view
        |FROM events GROUP BY 1 ORDER BY hod""".stripMargin,

    // TRY_CAST after extraction on both engines: a non-numeric k counts
    // as absent (Spark's .cast("long") nulls it), never a hard error
    "q_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        |  count(k) AS n_with_k,
        |  sum(k)::BIGINT AS sum_k,
        |  min(k) AS min_k, max(k) AS max_k
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Same union + window formulation, so tie semantics are identical by
    // construction (right-before-left at equal ts, max purchase_id among
    // equal-ts purchases, ROWS frame).
    "q_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    event_type, value
        |  FROM events),
        |u AS (
        |  SELECT event_id, user_id, ts_us,
        |    NULL::BIGINT AS purchase_id, NULL::DOUBLE AS purchase_value,
        |    1 AS is_left
        |  FROM ev WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT NULL, user_id, ts_us, event_id, value, 0
        |  FROM ev WHERE event_type = 'purchase' AND ts_us IS NOT NULL),
        |w AS (
        |  SELECT *,
        |    last_value(CASE WHEN is_left = 0 THEN
        |        struct_pack(pid := purchase_id, pval := purchase_value)
        |      END IGNORE NULLS) OVER (
        |      PARTITION BY user_id
        |      ORDER BY ts_us, is_left, purchase_id ASC NULLS FIRST
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ap
        |  FROM u)
        |SELECT event_id, user_id, ts_us,
        |  ap.pid AS purchase_id, ap.pval AS purchase_value
        |FROM w WHERE is_left = 1 ORDER BY event_id""".stripMargin,

    "q_range_join" ->
      s"""SELECT o_orderkey, count(*) AS n_shipped
        |FROM (SELECT * FROM orders
        |      WHERE ${graft.functions.Hashing.h32Sql("'rj|' || o_orderkey::VARCHAR")} % 100 = 0)
        |  JOIN lineitem
        |  ON date_diff('day', DATE '1970-01-01', l_shipdate::DATE)
        |       >= date_diff('day', DATE '1970-01-01', o_orderdate::DATE)
        |  AND date_diff('day', DATE '1970-01-01', l_shipdate::DATE)
        |       < date_diff('day', DATE '1970-01-01', o_orderdate::DATE) + 7
        |GROUP BY o_orderkey ORDER BY o_orderkey""".stripMargin,

    "q_sessionize" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS ts_us,
        |    lag(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_us,
        |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM ev),
        |sess AS (
        |  SELECT user_id, ts_us,
        |    (sum(new_sess) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts_us) AS start_us, max(ts_us) AS end_us
        |FROM sess GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin
  )
}
