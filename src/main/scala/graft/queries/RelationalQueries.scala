package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Exact._

/** Core relational operator coverage (SURVEY.md §2.2-§2.7) expressed
  * over the TPC-H-ish testdata, each with a DuckDB oracle.
  *
  * Conventions for hash-stable oracle parity:
  *  - money aggregated as exact integer cents (Exact.cents);
  *  - every output deterministically ordered;
  *  - ratios/percentiles as single per-row double expressions written
  *    identically in the Spark plan and the oracle SQL.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1-style pricing summary: scan + hash aggregate (A1/A3
    * analogue: groupBy + sums/counts; reference `EntitiesScorer.scala:45-58`). */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        count(lit(1)).as("n_rows"),
        sum(cents(col("l_extendedprice"))).as("sum_price_cents"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Multi-way dim join with broadcast hints (J5/P1 shape: reference
    * `filter/TypeFilter.scala:23-43` joins broadcast dims then filters). */
  def q02RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy("r_name")
      .agg(
        countDistinct("o_orderkey").as("n_orders"),
        sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("revenue_cents"))
      .orderBy("r_name")
  }

  /** Global top-k (orderBy+limit → TakeOrderedAndProject; SURVEY §2.6). */
  def q03TopOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("price_cents"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(10)

  /** Ranking window per partition (W3: reference
    * `WeightTrainerStage.scala:249-256`). Deterministic tiebreak. */
  def q04WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("price_cents").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .orderBy("o_custkey", "rnk", "o_orderkey")
  }

  /** Analytic max-over-partition (W2: reference
    * `TotalStatisticStage.scala:59-66`). */
  def q05WindowMax(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), cents(col("o_totalprice")).as("price_cents"))
      .withColumn("cust_max_cents",
        max(col("price_cents")).over(Window.partitionBy("o_custkey")))
      .orderBy("o_orderkey")

  /** Left-semi join — EXISTS (P4: reference `DocumentVersionIdFilter`
    * emulated it with inner join + drop; semi join avoids the dup blowup). */
  def q06SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val f = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
    Tables.customer(s, dir)
      .join(f, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
  }

  /** Left-anti join — NOT EXISTS (J6: reference `PictureHashAnalyser2.scala:57`). */
  def q07AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    Tables.customer(s, dir)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Set ops: EXCEPT + INTERSECT distinct semantics (SURVEY §2.7). */
  def q08SetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct()
    val done = o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
    val onlyOpen = open.except(done).withColumn("tag", lit("only_open"))
    val both = open.intersect(done).withColumn("tag", lit("both"))
    onlyOpen.unionByName(both).orderBy("o_custkey", "tag")
  }

  /** Pivot — one wide column per score type (A13: reference
    * `ScoreListStage.scala:57-109` hand-rolled this; built-in pivot). */
  def q09Pivot(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(cents(col("o_totalprice"))))
      .na.fill(0L, Seq("F", "O", "P"))
      .withColumnRenamed("F", "status_f_cents")
      .withColumnRenamed("O", "status_o_cents")
      .withColumnRenamed("P", "status_p_cents")
      .orderBy("c_mktsegment")
  }

  /** Conditional aggregation sum(when(...)) (A9: reference
    * `WeightTrainerStage.scala:218-240` top-k counts). */
  def q10ConditionalAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
        sum(when(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0, 1L)
          .otherwise(0L)).as("n_open_big"))
      .withColumn("share_f", r6(col("n_f").cast("double") / col("n_total")))
      .orderBy("o_orderpriority")

  /** Exact distinct counting (A10: reference `countDistinct` document
    * frequency, `DocumentWordSpecAnalyser2.scala:111-116`). */
  def q11DistinctCount(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.groupBy("l_returnflag")
      .agg(
        countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"),
        countDistinct("l_orderkey").as("n_orders"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** Percentile normalisation (W1: reference `NormalisationStage.scala:54-58`
    * — score of the ceil(1%·n)-th highest row becomes 100, everything
    * capped at 100). The reference threshold comes from
    * [[graft.operators.Normalisation.kthLargest]]: a bounded-bucket
    * histogram refinement — no global sort AND no TakeOrdered whose k
    * grows with the table (NormalisationSpec asserts the plan). */
  def q12PercentileNorm(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
    graft.operators.Normalisation.percentileNormalise(o, "price_cents")
      .select("o_orderkey", "price_cents", "norm_score")
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_region_revenue" -> (q02RegionRevenue _),
    "q03_top_orders" -> (q03TopOrders _),
    "q04_window_rank" -> (q04WindowRank _),
    "q05_window_max" -> (q05WindowMax _),
    "q06_semi_join" -> (q06SemiJoin _),
    "q07_anti_join" -> (q07AntiJoin _),
    "q08_set_ops" -> (q08SetOps _),
    "q09_pivot" -> (q09Pivot _),
    "q10_conditional_agg" -> (q10ConditionalAgg _),
    "q11_distinct_count" -> (q11DistinctCount _),
    "q12_percentile_norm" -> (q12PercentileNorm _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         count(*) AS n_rows,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
         CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_region_revenue" ->
      """SELECT r_name,
         count(DISTINCT o_orderkey) AS n_orders,
         CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY r_name ORDER BY r_name""",
    "q03_top_orders" ->
      """SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
         FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10""",
    "q04_window_rank" ->
      """SELECT * FROM (
           SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
             rank() OVER (PARTITION BY o_custkey
               ORDER BY CAST(round(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rnk
           FROM orders) t
         WHERE rnk <= 3 ORDER BY o_custkey, rnk, o_orderkey""",
    "q05_window_max" ->
      """SELECT o_orderkey, o_custkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
         max(CAST(round(o_totalprice*100) AS BIGINT))
           OVER (PARTITION BY o_custkey) AS cust_max_cents
         FROM orders ORDER BY o_orderkey""",
    "q06_semi_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
         ORDER BY c_custkey""",
    "q07_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q08_set_ops" ->
      """WITH open_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         done_c AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
         SELECT o_custkey, 'only_open' AS tag FROM (SELECT * FROM open_c EXCEPT SELECT * FROM done_c)
         UNION ALL
         SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM open_c INTERSECT SELECT * FROM done_c)
         ORDER BY o_custkey, tag""",
    "q09_pivot" ->
      """SELECT c_mktsegment,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice*100) AS BIGINT) END), 0) AS BIGINT) AS status_f_cents,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice*100) AS BIGINT) END), 0) AS BIGINT) AS status_o_cents,
         CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice*100) AS BIGINT) END), 0) AS BIGINT) AS status_p_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q10_conditional_agg" ->
      """SELECT o_orderpriority, n_total, n_f, n_open_big,
         CAST(round((CAST(n_f AS DOUBLE) / n_total)*1e6) AS BIGINT)/1e6 AS share_f
         FROM (SELECT o_orderpriority,
           count(*) AS n_total,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
           CAST(sum(CASE WHEN o_orderstatus = 'O' AND o_totalprice > 100000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_open_big
           FROM orders GROUP BY o_orderpriority) t
         ORDER BY o_orderpriority""",
    "q11_distinct_count" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT l_orderkey) AS n_orders,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q12_percentile_norm" ->
      """WITH p AS (SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents FROM orders),
         n AS (SELECT count(*) AS c FROM p),
         ranked AS (SELECT price_cents, row_number() OVER (ORDER BY price_cents DESC) AS rn FROM p),
         ref AS (SELECT min(price_cents) AS ref_cents FROM ranked
                 WHERE rn <= (SELECT greatest(1, CAST(ceil(c * 0.01) AS BIGINT)) FROM n))
         SELECT o_orderkey, price_cents,
           CAST(round((least(100.0, 100.0 * price_cents / ref_cents))*1e6) AS BIGINT)/1e6 AS norm_score
         FROM p, ref ORDER BY o_orderkey""")
}
