package graft

import graft.contract._
import graft.core.FeatureType._
import graft.expr._
import graft.ops._
import graft.sources.ParquetSource
import graft.store.ContractStore
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver contract — one entry per operator from SURVEY.md §2, each with a
  * DuckDB oracle where SQL-expressible.
  *
  * Hash-stability discipline: every aggregated float goes through exact
  * DECIMAL aggregation (the test data is 2-decimal money), averages are
  * exact-sum/count, timestamps are emitted as DATE or epoch seconds, and
  * orderings always carry a unique tiebreaker — so Spark and DuckDB agree
  * bit-for-bit, not just approximately.
  */
object SparkEntry {

  // ---------- table readers ----------

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects; read nanos as long and convert to a microsecond timestamp
    * (matching DuckDB's native µs TIMESTAMP after CAST). */
  private def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  // ---------- exact-aggregation helpers ----------

  /** exact decimal sum of a 2-decimal double column, emitted at a fixed type. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DecimalType(38, scale))
  /** exact average = exact decimal sum / count (bit-identical across engines). */
  private def davg(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double") / count(c)
  private def sqlDsum(x: String, scale: Int = 2): String =
    s"CAST(sum(CAST($x AS DECIMAL(18,$scale))) AS DECIMAL(38,$scale))"
  private def sqlDavg(x: String, scale: Int = 2): String =
    s"CAST(sum(CAST($x AS DECIMAL(18,$scale))) AS DOUBLE) / count($x)"

  // ---------- query registry ----------

  final case class Q(name: String, fn: (SparkSession, String) => DataFrame, oracle: Option[String])

  private val relational: Seq[Q] = Seq(
    // --- scan + filter + group-by aggregate (SURVEY §2.1, §2.6 shape 1) ---
    Q("q1_pricing_summary",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 4)))
            .cast(DecimalType(38, 4)).as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .cast(DecimalType(18, 6))).cast(DecimalType(38, 6)).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")),
      Some(s"""SELECT l_returnflag, l_linestatus,
        ${sqlDsum("l_quantity")} AS sum_qty,
        ${sqlDsum("l_extendedprice")} AS sum_base_price,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_charge,
        ${sqlDavg("l_quantity")} AS avg_qty,
        ${sqlDavg("l_extendedprice")} AS avg_price,
        ${sqlDavg("l_discount")} AS avg_disc,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    // --- contract with derived features + constraint filter (SURVEY §2.2-2.4):
    // goes through the FeatureView/Expr ADT path, not raw DataFrame ops ---
    Q("q2_derived_features",
      (s, dir) => {
        val view = FeatureView(
          name = "lineitem",
          source = ParquetSource(s"$dir/lineitem.parquet"),
          entities = Seq(Feature("l_orderkey", FInt64), Feature("l_linenumber", FInt32)),
          features = Seq(
            Feature("l_quantity", FFloat64), Feature("l_extendedprice", FFloat64),
            Feature("l_discount", FFloat64), Feature("l_tax", FFloat64),
            Feature("l_returnflag", FString), Feature("l_shipdate", FDatetime())),
          derived = Seq(
            DerivedFeature("disc_price", FFloat64,
              Ref("l_extendedprice") * (Lit(1.0) - Ref("l_discount")), Seq("l_extendedprice", "l_discount")),
            DerivedFeature("charge", FFloat64,
              Ref("l_extendedprice") * (Lit(1.0) - Ref("l_discount")) * (Lit(1.0) + Ref("l_tax")),
              Seq("l_extendedprice", "l_discount", "l_tax")),
            DerivedFeature("is_returned", FBool,
              Ref("l_returnflag") === Lit("R"), Seq("l_returnflag")),
            DerivedFeature("qty_bucket", FInt32,
              Binary("floor_div", Ref("l_quantity"), Lit(10.0)), Seq("l_quantity"), depth = 1),
            DerivedFeature("price_per_unit", FFloat64,
              Ref("disc_price") / Ref("l_quantity"), Seq("disc_price", "l_quantity"), depth = 2)),
          eventTimestamp = Some(EventTimestamp("l_shipdate")))
        val store = new ContractStore().addView(view)
        store.view("lineitem").all(s)
          .filter(col("l_quantity") > 45)
          .select("l_orderkey", "l_linenumber", "disc_price", "charge", "is_returned",
            "qty_bucket", "price_per_unit")
      },
      Some("""SELECT l_orderkey, l_linenumber,
        l_extendedprice * (1 - l_discount) AS disc_price,
        l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
        l_returnflag = 'R' AS is_returned,
        CAST(floor(l_quantity / 10) AS INT) AS qty_bucket,
        (l_extendedprice * (1 - l_discount)) / l_quantity AS price_per_unit
        FROM lineitem WHERE l_quantity > 45""")),

    // --- multi-way join with broadcast dims + aggregate (SURVEY §2.5) ---
    Q("q3_revenue_by_nation",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(DecimalType(18, 4)))
              .cast(DecimalType(38, 4)).as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT r_name, n_name,
        CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS revenue,
        count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    // --- order-by + limit (top-k) with deterministic tiebreak (SURVEY §2.7) ---
    Q("q4_top_customers",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n_orders"))
        .orderBy(col("total_spent").desc, col("o_custkey").asc)
        .limit(10),
      Some(s"""SELECT o_custkey, ${sqlDsum("o_totalprice")} AS total_spent, count(*) AS n_orders
        FROM orders GROUP BY o_custkey
        ORDER BY total_spent DESC, o_custkey LIMIT 10""")),

    // --- ranking window function (SURVEY §2.7) ---
    Q("q5_window_rank",
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        t(s, dir, "customer")
          .withColumn("rank_in_segment", row_number().over(w))
          .filter(col("rank_in_segment") <= 3)
          .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal", "rank_in_segment")
      },
      Some("""SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
        CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INT)
          AS rank_in_segment
        FROM customer
        QUALIFY rank_in_segment <= 3""")),

    // --- UNION ALL with provenance (StackJob/StackSource, SURVEY §2.8) ---
    Q("q6_union_parties",
      (s, dir) => {
        val c = t(s, dir, "customer").select(
          col("c_custkey").as("party_key"), col("c_name").as("party_name"),
          col("c_acctbal").as("acctbal"), col("c_nationkey").as("nationkey"))
          .withColumn("party_type", lit("customer"))
        val su = t(s, dir, "supplier").select(
          col("s_suppkey").as("party_key"), col("s_name").as("party_name"),
          col("s_acctbal").as("acctbal"), col("s_nationkey").as("nationkey"))
          .withColumn("party_type", lit("supplier"))
        c.unionByName(su)
      },
      Some("""SELECT c_custkey AS party_key, c_name AS party_name, c_acctbal AS acctbal,
          c_nationkey AS nationkey, 'customer' AS party_type FROM customer
        UNION ALL
        SELECT s_suppkey, s_name, s_acctbal, s_nationkey, 'supplier' FROM supplier""")),

    // --- dedup keep-latest (UniqueRowsJob, SURVEY §2.7) ---
    Q("q7_latest_order",
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        t(s, dir, "orders")
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_orderdate"),
            col("o_totalprice").as("latest_totalprice"))
      },
      Some("""SELECT o_custkey, o_orderkey AS latest_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS latest_orderdate, o_totalprice AS latest_totalprice
        FROM orders
        QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1""")),

    // --- semi + anti join (SURVEY §2.5) ---
    Q("q8_customers_without_big_orders",
      (s, dir) => {
        val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 400000)
        t(s, dir, "customer")
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)""")),
    Q("q8b_customers_with_urgent_orders",
      (s, dir) => {
        val urgent = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        t(s, dir, "customer")
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
      },
      Some("""SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""))
  )

  // ---------- time-based queries: as-of, point-in-time, windows (SURVEY §2.5-2.7) ----------

  private def purchases(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("event_type") === "purchase")

  /** clicks deduped to one row per (user_id, ts) so as-of tie-breaks are
    * engine-independent. */
  private def clicksByTs(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))

  private val timeQueries: Seq[Q] = Seq(
    // --- backward as-of join (JoinAsofJob, SURVEY §2.5) ---
    Q("q9_asof_last_click",
      (s, dir) => {
        val p = purchases(s, dir)
          .select(col("event_id"), col("user_id"), col("ts"), col("value").as("purchase_value"))
        Joins.asofJoin(p, clicksByTs(s, dir), "ts", "ts", Seq("user_id"))
          .select(col("event_id"), col("user_id"), col("ts").cast("long").as("ts_sec"),
            col("purchase_value"), col("click_value").as("last_click_value"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
                FROM events WHERE event_type = 'purchase'),
          c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS click_value
                FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        SELECT p.event_id, p.user_id, epoch_us(p.ts) // 1000000 AS ts_sec,
          p.value AS purchase_value, c.click_value AS last_click_value
        FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
        QUALIFY row_number() OVER (PARTITION BY p.event_id ORDER BY c.ts DESC NULLS LAST) = 1""")),

    // --- point-in-time lookup through the ContractStore, with TTL (SURVEY §3.1) ---
    Q("q10_pit_last_view",
      (s, dir) => {
        val viewEvents = graft.sources.TransformSource(
          graft.sources.ParquetSource(s"$dir/events.parquet"),
          _ => events(s, dir).filter(col("event_type") === "view")
            .groupBy("user_id", "ts").agg(max(col("value")).as("value")))
        val v = FeatureView(
          name = "user_views",
          source = viewEvents,
          entities = Seq(Feature("user_id", FInt64)),
          features = Seq(Feature("value", FFloat64)),
          eventTimestamp = Some(EventTimestamp("ts", Some(java.time.Duration.ofDays(1)))))
        val store = new ContractStore().addView(v)
        val facts = purchases(s, dir)
          .select(col("event_id"), col("user_id"), col("ts").as("event_timestamp"))
        store.featuresFor(s, facts, Seq("user_views:value"))
          .select(col("event_id"), col("user_id"), col("value").as("last_view_value"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                FROM events WHERE event_type = 'view'),
          pp AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                FROM events WHERE event_type = 'purchase'),
          v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS value
                FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        SELECT pp.event_id, pp.user_id, v.value AS last_view_value
        FROM pp LEFT JOIN v ON v.user_id = pp.user_id AND v.ts <= pp.ts
          AND v.ts >= pp.ts - INTERVAL 1 DAY
        QUALIFY row_number() OVER (PARTITION BY pp.event_id ORDER BY v.ts DESC NULLS LAST) = 1""")),

    // --- point-in-time windowed aggregates per fact row (SURVEY §2.6 shape 3) ---
    Q("q11_pit_click_aggs",
      (s, dir) => {
        val v = FeatureView(
          name = "user_clicks",
          source = graft.sources.TransformSource(
            graft.sources.ParquetSource(s"$dir/events.parquet"),
            _ => events(s, dir).filter(col("event_type") === "click")),
          entities = Seq(Feature("user_id", FInt64)),
          features = Seq(Feature("value", FFloat64)),
          aggregates = Seq(
            AggregatedFeature("n_clicks_24h", FInt64, AggFunc.Count, "value",
              Some(AggregationWindow(java.time.Duration.ofDays(1)))),
            AggregatedFeature("sum_clicks_24h", FFloat64,
              AggFunc.Custom(c => sum(c.cast(DecimalType(18, 2))).cast(DecimalType(38, 2))), "value",
              Some(AggregationWindow(java.time.Duration.ofDays(1))))),
          eventTimestamp = Some(EventTimestamp("ts")))
        val store = new ContractStore().addView(v)
        val facts = purchases(s, dir)
          .select(col("event_id"), col("user_id"), col("ts").as("event_timestamp"))
        store.featuresFor(s, facts, Seq("user_clicks:n_clicks_24h", "user_clicks:sum_clicks_24h"))
          .select("event_id", "user_id", "n_clicks_24h", "sum_clicks_24h")
      },
      Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
                FROM events WHERE event_type = 'purchase'),
          c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
                FROM events WHERE event_type = 'click')
        SELECT p.event_id, p.user_id, count(c.value) AS n_clicks_24h,
          CAST(sum(CAST(c.value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_clicks_24h
        FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
          AND c.ts >= p.ts - INTERVAL 1 DAY
        GROUP BY p.event_id, p.user_id""")),

    // --- rolling trailing window per row (SURVEY §2.6 shape 2a) ---
    Q("q12_rolling_1h",
      (s, dir) => {
        val aggs = Seq(
          AggregatedFeature("n_1h", FInt64, AggFunc.Count, "value",
            Some(AggregationWindow(java.time.Duration.ofHours(1)))),
          AggregatedFeature("sum_1h", FFloat64,
            AggFunc.Custom(c => sum(c.cast(DecimalType(18, 2)))), "value",
            Some(AggregationWindow(java.time.Duration.ofHours(1)))))
        Aggregations.rolling(events(s, dir), Seq("user_id"), "ts", aggs)
          .select(col("event_id"), col("n_1h"), col("sum_1h").cast(DecimalType(38, 2)).as("sum_1h"))
      },
      Some("""SELECT event_id,
          count(value) OVER w AS n_1h,
          CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(38,2)) AS sum_1h
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""")),

    // --- tumbling event-time window aggregate (SURVEY §2.6 shape 2b) ---
    Q("q13_hourly_by_type",
      (s, dir) => events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value")),
      Some(s"""SELECT strftime(time_bucket(INTERVAL 1 HOUR, CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S') AS window_start,
          event_type, count(*) AS n, ${sqlDsum("value")} AS total_value
        FROM events GROUP BY 1, 2""")),

    // --- sliding event-time windows (every_interval semantics, SURVEY §2.6) ---
    Q("q14_sliding_1h_15m",
      (s, dir) => events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
          col("event_type"), col("n"), col("total_value")),
      Some(s"""SELECT strftime(time_bucket(INTERVAL 15 MINUTES, CAST(ts AS TIMESTAMP)) - k.k * INTERVAL 15 MINUTES, '%Y-%m-%d %H:%M:%S') AS window_start,
          event_type, count(*) AS n, ${sqlDsum("value")} AS total_value
        FROM events CROSS JOIN (SELECT unnest([0,1,2,3]) AS k) k
        GROUP BY 1, 2""")),

    // --- freshness = max event-ts (SURVEY §2.13) ---
    Q("q15_freshness",
      (s, dir) => events(s, dir).agg(
        max(col("ts")).cast("long").as("max_ts_sec"),
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users")),
      Some("""SELECT epoch_us(max(CAST(ts AS TIMESTAMP))) // 1000000 AS max_ts_sec,
          count(*) AS n_events, count(DISTINCT user_id) AS n_users FROM events"""))
  )

  // ---------- scalar expression coverage (SURVEY §2.4) ----------

  private val scalarQueries: Seq[Q] = Seq(
    // --- date components ---
    Q("q16_date_parts",
      (s, dir) => {
        events(s, dir).select(
          col("event_id"),
          DateComponent("year", Ref("ts")).toColumn.as("y"),
          DateComponent("month", Ref("ts")).toColumn.as("mo"),
          DateComponent("day", Ref("ts")).toColumn.as("d"),
          DateComponent("hour", Ref("ts")).toColumn.as("h"),
          DateComponent("minute", Ref("ts")).toColumn.as("mi"),
          DateComponent("second", Ref("ts")).toColumn.as("sec"),
          DateComponent("weekday", Ref("ts")).toColumn.as("dow"),
          DateComponent("ordinal_day", Ref("ts")).toColumn.as("doy"),
          DateComponent("week", Ref("ts")).toColumn.as("wk"),
          DateComponent("epoch", Ref("ts")).toColumn.as("epoch_sec"))
      },
      Some("""SELECT event_id,
          CAST(year(t) AS INT) AS y, CAST(month(t) AS INT) AS mo, CAST(day(t) AS INT) AS d,
          CAST(hour(t) AS INT) AS h, CAST(minute(t) AS INT) AS mi, CAST(second(t) AS INT) AS sec,
          CAST(dayofweek(t) + 1 AS INT) AS dow, CAST(dayofyear(t) AS INT) AS doy,
          CAST(week(t) AS INT) AS wk, epoch_us(t) // 1000000 AS epoch_sec
        FROM (SELECT event_id, CAST(ts AS TIMESTAMP) AS t FROM events)""")),

    // --- string functions ---
    Q("q17_string_funcs",
      (s, dir) => t(s, dir, "part").select(
        col("p_partkey"),
        Unary("str_to_upper", Ref("p_name")).toColumn.as("name_upper"),
        Unary("str_to_lower", Ref("p_brand")).toColumn.as("brand_lower"),
        Unary("str_len_char", Ref("p_name")).toColumn.as("name_len"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        ReplaceStrings(Ref("p_type"), Seq((" ", "_"))).toColumn.as("type_snake"),
        AppendStrings(Seq(Ref("p_brand"), Ref("p_type")), "/").toColumn.as("brand_type"),
        element_at(split(col("p_type"), " "), 1).as("type_first_word"),
        Binary("str_contains", Ref("p_name"), Lit("red")).toColumn.as("has_red"),
        Binary("str_starts_with", Ref("p_type"), Lit("STANDARD")).toColumn.as("is_standard"),
        Binary("str_ends_with", Ref("p_name"), Lit("e")).toColumn.as("ends_e"),
        trim(lpad(col("p_brand"), 12, "#")).as("brand_padded")),
      Some("""SELECT p_partkey, upper(p_name) AS name_upper, lower(p_brand) AS brand_lower,
          CAST(length(p_name) AS INT) AS name_len, substr(p_name, 1, 8) AS name_prefix,
          replace(p_type, ' ', '_') AS type_snake,
          concat(p_brand, '/', p_type) AS brand_type,
          string_split(p_type, ' ')[1] AS type_first_word,
          contains(p_name, 'red') AS has_red,
          starts_with(p_type, 'STANDARD') AS is_standard,
          p_name LIKE '%e' AS ends_e,
          trim(lpad(p_brand, 12, '#'), ' ') AS brand_padded
        FROM part""")),

    // --- math functions (transcendentals rounded: libm vs JDK last-ulp) ---
    Q("q18_math_funcs",
      (s, dir) => t(s, dir, "lineitem").filter(col("l_linenumber") === 1).select(
        col("l_orderkey"),
        Unary("abs", Ref("l_discount") - Lit(0.05)).toColumn.as("abs_v"),
        Unary("ceil", Ref("l_quantity") / Lit(7.0)).toColumn.cast("long").as("ceil_v"),
        Unary("floor", Ref("l_quantity") / Lit(7.0)).toColumn.cast("long").as("floor_v"),
        Unary("sqrt", Ref("l_extendedprice")).toColumn.as("sqrt_v"),
        round(Unary("log", Ref("l_extendedprice")).toColumn, 6).as("ln_v"),
        round(Unary("log10", Ref("l_extendedprice")).toColumn, 6).as("log10_v"),
        round(Unary("exp", Ref("l_discount")).toColumn, 6).as("exp_v"),
        Unary("sign", Ref("l_discount") - Lit(0.05)).toColumn.as("sign_v"),
        Binary("pow", Ref("l_quantity"), Lit(2.0)).toColumn.as("pow_v"),
        Binary("mod", Ref("l_orderkey"), Lit(7L)).toColumn.as("mod_v"),
        Binary("min", Ref("l_quantity"), Lit(25.0)).toColumn.as("min_v"),
        Binary("max", Ref("l_quantity"), Lit(25.0)).toColumn.as("max_v"),
        // divide by 3: the quotient never lands on an exact decimal rounding
        // tie, so HALF_UP (JVM) and C-lib rounding agree bit-for-bit
        round(col("l_extendedprice") / 3.0, 2).as("round_v")),
      Some("""SELECT l_orderkey, abs(l_discount - 0.05) AS abs_v,
          CAST(ceil(l_quantity / 7.0) AS BIGINT) AS ceil_v,
          CAST(floor(l_quantity / 7.0) AS BIGINT) AS floor_v,
          sqrt(l_extendedprice) AS sqrt_v,
          round(ln(l_extendedprice), 6) AS ln_v,
          round(log10(l_extendedprice), 6) AS log10_v,
          round(exp(l_discount), 6) AS exp_v,
          CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_v,
          pow(l_quantity, 2.0) AS pow_v,
          CAST(l_orderkey % 7 AS BIGINT) AS mod_v,
          least(l_quantity, 25.0) AS min_v,
          greatest(l_quantity, 25.0) AS max_v,
          round(l_extendedprice / 3.0, 2) AS round_v
        FROM lineitem WHERE l_linenumber = 1""")),

    // --- JSON extraction (SURVEY §2.4 JsonPath/StructField) ---
    Q("q19_json_extract",
      (s, dir) => events(s, dir).select(
        col("event_id"),
        JsonPath(Ref("props"), "$.k").toColumn.cast("int").as("k_value"),
        StructFieldAccess(Ref("props"), "k", isJson = true).toColumn.isNotNull.as("has_k")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_value,
          json_extract_string(props, '$.k') IS NOT NULL AS has_k FROM events""")),

    // --- conditionals: clip, between, isin, fill-na, case (SURVEY §2.4) ---
    Q("q20_conditionals",
      (s, dir) => t(s, dir, "customer").select(
        col("c_custkey"),
        Clip(Ref("c_acctbal"), 0.0, 5000.0).toColumn.as("bal_clipped"),
        IsBetween(Ref("c_acctbal"), Lit(1000.0), Lit(2000.0)).toColumn.as("bal_mid"),
        IsIn(Ref("c_mktsegment"), Seq("BUILDING", "MACHINERY")).toColumn.as("seg_flag"),
        FillNaColumn(Ref("c_name"), Ref("c_mktsegment")).toColumn.as("name_filled"),
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low").otherwise("high").as("bal_band"),
        Ordinal(Ref("c_mktsegment"),
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")).toColumn.as("seg_ord")),
      Some("""SELECT c_custkey,
          greatest(least(c_acctbal, 5000.0), 0.0) AS bal_clipped,
          c_acctbal BETWEEN 1000.0 AND 2000.0 AS bal_mid,
          c_mktsegment IN ('BUILDING', 'MACHINERY') AS seg_flag,
          coalesce(c_name, c_mktsegment) AS name_filled,
          CASE WHEN c_acctbal < 0 THEN 'negative' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band,
          CAST(CASE c_mktsegment WHEN 'AUTOMOBILE' THEN 0 WHEN 'BUILDING' THEN 1 WHEN 'FURNITURE' THEN 2
            WHEN 'HOUSEHOLD' THEN 3 WHEN 'MACHINERY' THEN 4 END AS INT) AS seg_ord
        FROM customer""")),

    // --- exact stats aggregations (SURVEY §2.6 function set) ---
    Q("q21_stats_by_flag",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val dec = col("l_quantity").cast(DecimalType(18, 2))
        li.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          count_distinct(col("l_orderkey")).as("n_orders"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          (sum(dec * dec).cast("double") / count(lit(1)) -
            (sum(dec).cast("double") / count(lit(1))) * (sum(dec).cast("double") / count(lit(1))))
            .as("pop_variance"),
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, array(0.25, 0.75))").getItem(0).as("q25_qty"))
      },
      Some("""SELECT l_returnflag, count(*) AS n, count(DISTINCT l_orderkey) AS n_orders,
          min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)
            - (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
              * (CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*)) AS pop_variance,
          quantile_cont(l_quantity, 0.5) AS median_qty,
          quantile_cont(l_quantity, 0.25) AS q25_qty
        FROM lineitem GROUP BY l_returnflag"""))
  )

  val specs: Seq[Q] = relational ++ timeQueries ++ scalarQueries

  // ---------- driver contract ----------

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    specs.head.fn(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
