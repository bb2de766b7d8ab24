package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational surface (SURVEY.md §2.2-2.6) re-expressed over
  * the driver's TPC-H-ish star, one query per operator family, each with a
  * DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Scale notes: dimension joins broadcast (region/nation are tiny);
  * fact-fact joins shuffle on their keys with AQE deciding skew splits;
  * top-k uses orderBy+limit which plans as TakeOrderedAndProject (no global
  * sort); all aggregates are partial+final hash aggregates.
  */
object StarQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship join+agg (reference `main.py:351-372`, SURVEY A1/J1-J4/T3):
    * 2 inner joins up the dimension chain, a left join to a child table,
    * group-by with DISTINCT aggregation of the child values. Arrays are
    * order-normalized into a sorted joined string so the DuckDB compare is
    * exact (`array_agg(DISTINCT ...)` has no defined order in either engine).
    */
  def flagshipAgg(spark: SparkSession, dir: String): DataFrame = {
    val customer = t(spark, dir, "customer")
    val nation   = t(spark, dir, "nation")
    val region   = t(spark, dir, "region")
    val orders   = t(spark, dir, "orders")
    // Aggregate-before-join (round 6, guide §2.3 "aggregate before you
    // shuffle"): orders are reduced to one row per ordering customer BEFORE
    // the customer join — the map-side partial aggregation combines each
    // partition's orders, so the orders exchange ships per-custkey partials
    // instead of every order row, the join probes |customers-with-orders|
    // rows instead of |orders|, and the post-join re-aggregation disappears
    // (c_custkey is the customer PK, so per-custkey pre-agg ≡ the old
    // post-join group-by). Semantics pinned by the unchanged DuckDB oracle:
    // collect_set skips nulls exactly like the old left-join aggregation,
    // concat_ws over a NULL array (customer with no orders) yields the same
    // '' the old empty-set path did, and the count/sum coalesce to 0.
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(
        array_sort(collect_set(col("o_orderpriority"))).as("__prio"),
        count(col("o_orderkey")).as("__n_orders"),
        sum(col("o_totalprice")).as("__spent"))
    customer
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .join(perCust, customer("c_custkey") === perCust("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"),
        concat_ws("|", col("__prio")).as("priorities"),
        coalesce(col("__n_orders"), lit(0L)).as("n_orders"),
        round(coalesce(col("__spent"), lit(0.0)), 2).as("total_spent"))
  }

  val flagshipAggSql: String =
    """SELECT c.c_custkey, c.c_name, n.n_name, r.r_name,
      |  coalesce(array_to_string(list_sort(list(DISTINCT o.o_orderpriority)
      |    FILTER (o.o_orderpriority IS NOT NULL)), '|'), '') AS priorities,
      |  count(o.o_orderkey) AS n_orders,
      |  round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY 1, 2, 3, 4""".stripMargin

  /** Conjunctive search predicates (reference `faculty_api/main.py:144-172`,
    * P1-P4): case-insensitive substring filters + OR keyword match, pushed to
    * the parquet scan by Catalyst.
    */
  def searchFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .filter(
        (contains(lower(col("p_name")), lit("ol")) ||
          contains(lower(col("p_type")), lit("brass"))) &&
          col("p_size") < 25)
      .select(col("p_partkey"), col("p_name"), col("p_type"), col("p_size"))

  val searchFilterSql: String =
    """SELECT p_partkey, p_name, p_type, p_size
      |FROM part
      |WHERE (contains(lower(p_name), 'ol') OR contains(lower(p_type), 'brass'))
      |  AND p_size < 25""".stripMargin

  /** Point lookup (reference `faculty_api/main.py:331-334`, P5). */
  def pointLookup(spark: SparkSession, dir: String): DataFrame = {
    val orders = t(spark, dir, "orders")
    val minKey = orders.agg(min(col("o_orderkey")).as("k"))
    orders.join(broadcast(minKey), orders("o_orderkey") === minKey("k"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("o_totalprice"))
  }

  val pointLookupSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice
      |FROM orders WHERE o_orderkey = (SELECT min(o_orderkey) FROM orders)""".stripMargin

  /** Top-k by score (reference `matcher.py:404` + `faculty_api/main.py:448`,
    * W1/W2): plans as TakeOrderedAndProject — no global sort materialization.
    * Deterministic tiebreak on the key, as SURVEY §2.5 W1 mandates.
    */
  def topkRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o  = t(spark, dir, "orders")
    val c  = t(spark, dir, "customer")
    // Aggregate-before-join (round 6, guide §2.3): lineitem — the biggest
    // table in the star — partially aggregates per l_orderkey BEFORE its
    // orders join, so the lineitem exchange ships one revenue partial per
    // (partition, orderkey) instead of every line row; the orders join then
    // probes |orders| rows, re-aggregates per customer (c_custkey is the
    // customer PK, so per-custkey pre-agg ≡ the old post-join group-by), and
    // only |customers| rows reach the customer join. Inner-join semantics
    // are unchanged: orders without lineitems and customers without orders
    // are absent from the result either way.
    val perOrder = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("__rev"))
    val perCust = perOrder.join(o, col("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("__rev")).as("__rev"))
    perCust.join(c, col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), round(col("__rev"), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(10)
  }

  val topkRevenueSql: String =
    """SELECT c.c_custkey, c.c_name,
      |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY 1, 2
      |ORDER BY revenue DESC, c.c_custkey ASC
      |LIMIT 10""".stripMargin

  /** Ranked window per group (SURVEY W4 — the wave selector's shape):
    * per-customer top-3 orders by price with deterministic tiebreaks.
    */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("rk"))
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rk
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders) x
      |WHERE rk <= 3""".stripMargin

  /** Existence probes as semi/anti joins (reference upsert probes
    * `main.py:150,164,187-190`, J5/J8): customers with no orders, per nation.
    */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val n = t(spark, dir, "nation")
    // distinct the probe side before the anti join (round 6, guide §2.3):
    // the map-side partial distinct collapses each partition's repeated
    // o_custkeys, so the probe exchange ships distinct keys per partition
    // instead of every order row; the distinct's exchange is keyed on
    // o_custkey, which the anti join reuses — no extra shuffle, identical
    // anti-join semantics (existence is idempotent to duplicates).
    val probe = o.select(col("o_custkey")).distinct()
    c.join(probe, c("c_custkey") === probe("o_custkey"), "left_anti")
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("customers_without_orders"))
  }

  val semiAntiSql: String =
    """SELECT n.n_name, count(*) AS customers_without_orders
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY 1""".stripMargin

  /** MERGE-style upsert without Iceberg (reference `main.py:196-239`, S5/T4):
    * updates win on matched keys, unmatched keep current values — the
    * full-outer/left-join rewrite SURVEY §7.4 describes. Updates here are a
    * deterministic sample of customers with adjusted balances.
    */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val updates = c.filter(pmod(col("c_custkey"), lit(10)) === 0)
      .select(col("c_custkey"), round(col("c_acctbal") + 100.0, 2).as("new_bal"))
    Upsert.applyUpdates(
      current = c.select(col("c_custkey"), col("c_name"), col("c_acctbal")),
      updates = updates, key = "c_custkey",
      setCols = Map("c_acctbal" -> "new_bal"))
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("c_acctbal"))
  }

  val upsertMergeSql: String =
    """SELECT c.c_custkey, c.c_name,
      |  round(CASE WHEN c.c_custkey % 10 = 0 THEN c.c_acctbal + 100.0
      |             ELSE c.c_acctbal END, 2) AS c_acctbal
      |FROM customer c""".stripMargin

  /** Interest-overlap scoring + top-k (reference
    * `faculty_api/main.py:181-186` A4, weights A7, top-k W2): token-set
    * overlap |a∩b| / max(|a|,|b|) between each part's type words and a fixed
    * query set, row-local array ops — no shuffle until the final top-k.
    */
  def interestOverlapTopk(spark: SparkSession, dir: String): DataFrame = {
    val query = array(lit("brushed"), lit("polished"), lit("anodized"))
    val toks  = array_distinct(split(lower(col("p_type")), " "))
    t(spark, dir, "part")
      .withColumn("score",
        round(
          size(array_intersect(toks, query)).cast("double") /
            greatest(size(toks), size(query)).cast("double"), 4))
      .filter(col("score") > 0)
      .select(col("p_partkey"), col("p_type"), col("score"))
      .orderBy(col("score").desc, col("p_partkey").asc)
      .limit(50)
  }

  val interestOverlapTopkSql: String =
    """SELECT p_partkey, p_type, score FROM (
      |  SELECT p_partkey, p_type,
      |    round(len(list_intersect(list_distinct(string_split(lower(p_type), ' ')),
      |                             ['brushed', 'polished', 'anodized']))
      |          / greatest(len(list_distinct(string_split(lower(p_type), ' '))), 3),
      |          4) AS score
      |  FROM part) s
      |WHERE score > 0
      |ORDER BY score DESC, p_partkey ASC
      |LIMIT 50""".stripMargin

  /** TPC-H Q1-shaped pricing summary (bench headline; SURVEY A-family). */
  def aggLineitem(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  val aggLineitemSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY 1, 2""".stripMargin

  /** Windowed event counts (SURVEY §2.9 / A8 — the fixed-window rate-limit
    * analog, reference `limiter.py:122-144`): per-minute per-type counts.
    */
  def eventsWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_trunc("minute", col("ts")).as("minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("value_sum"))

  val eventsWindowSql: String =
    """SELECT date_trunc('minute', ts) AS minute, event_type,
      |  count(*) AS n, round(sum(value), 2) AS value_sum
      |FROM events
      |GROUP BY 1, 2""".stripMargin
}
