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

  val specs: Seq[Q] = relational

  // ---------- driver contract ----------

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    specs.head.fn(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
