package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7.
  *
  * Every operator from SURVEY §2 (reference parity) and the extended
  * 100 TB analytics surface gets one entry in `queries` and, when
  * ANSI-SQL-expressible deterministically, a matching DuckDB oracle in
  * `oracleSql`. Column aliases match exactly between the two (the
  * driver sorts columns by name before hashing). Determinism rules
  * (FIXTURES.md): decimal-cast big float sums, round(.,6) small-frame
  * window means and dot products, unique-key ORDER BY everywhere, no
  * uuid()/current_timestamp() in outputs.
  */
object SparkEntry {

  /** Flagship: the whole reference hot path (normalize → clean → SMA →
    * alerts) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    RefPipeline.pipeline(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- Reference parity (SURVEY §2.1-2.3, financial_engine.py) ----
    "ref_normalize_union" -> ((s, dir) =>
      RefPipeline.normalizeUnion(s, dir)
        .orderBy("id")),

    "ref_clean" -> ((s, dir) =>
      RefPipeline.clean(
        Tables.events(s, dir).select(
          col("event_id").as("id"),
          col("value").as("price"),
          get_json_object(col("props"), "$.k").cast("bigint").as("volume")))
        .orderBy("id")),

    "ref_sma" -> ((s, dir) =>
      RefPipeline.movingAverage(
        Tables.events(s, dir).select(
          col("event_id").as("id"),
          col("user_id").as("symbol"),
          col("value").as("price")),
        n = 5)
        .orderBy("id")),

    "ref_alerts" -> ((s, dir) =>
      RefPipeline.alerts(
        RefPipeline.movingAverage(
          Tables.events(s, dir).select(
            col("event_id").as("id"),
            col("user_id").as("symbol"),
            col("value").as("price")),
          n = 5),
        threshold = 108.0)
        .orderBy("id")),

    "ref_pipeline" -> ((s, dir) =>
      RefPipeline.pipeline(s, dir)
        .orderBy("id")),

    // ---- Extended analytics (SURVEY §2.3-2.7 absent categories, §7 step 3) ----
    "x_pricing_summary"    -> ((s, dir) => Analytics.pricingSummary(s, dir)),
    "x_top_revenue_orders" -> ((s, dir) => Analytics.topRevenueOrders(s, dir)),
    "x_brand_volume"       -> ((s, dir) => Analytics.brandVolume(s, dir)),
    "x_order_priority"     -> ((s, dir) => Analytics.orderPriorityCount(s, dir)),
    "x_join_semi"          -> ((s, dir) => Analytics.customersWithOrders(s, dir)),
    "x_join_anti"          -> ((s, dir) => Analytics.customersWithoutOrders(s, dir)),
    "x_topk_per_supplier"  -> ((s, dir) => Analytics.topkPerSupplier(s, dir)),
    "x_rollup"             -> ((s, dir) => Analytics.returnFlagRollup(s, dir)),
    "x_cube"               -> ((s, dir) => Analytics.orderStatusCube(s, dir)),
    "x_hourly_events"      -> ((s, dir) => Analytics.hourlyEventAgg(s, dir)),
    "x_json_props"         -> ((s, dir) => Analytics.jsonPropsAgg(s, dir)),
    "x_running_spend"      -> ((s, dir) => Analytics.runningCustomerSpend(s, dir)),
    "x_value_bands"        -> ((s, dir) => Analytics.valueBandJoin(s, dir)),
    "x_approx_distinct"    -> ((s, dir) => Analytics.approxDistinctParts(s, dir)),
    "x_asof_join"          -> ((s, dir) => AsOfJoin.clickEnrichedWithLastView(s, dir))
  )

  def oracleSql: Map[String, String] = Map(
    "ref_normalize_union" ->
      """SELECT * FROM (
        |  SELECT event_id AS id, 'u' || CAST(user_id AS VARCHAR) AS symbol,
        |         CAST(CAST(value AS VARCHAR) AS DOUBLE) AS price,
        |         CAST(props->>'$.k' AS BIGINT) AS volume,
        |         epoch_us(ts)//1000000 AS ts_epoch,
        |         'AlphaVantage' AS source
        |  FROM events WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT event_id AS id, 'u' || CAST(user_id AS VARCHAR) AS symbol,
        |         value AS price,
        |         CAST(props->>'$.k' AS BIGINT) AS volume,
        |         epoch_us(ts)//1000000 AS ts_epoch,
        |         'WebSocketMock' AS source
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id AS id, 'u' || CAST(user_id AS VARCHAR) AS symbol,
        |         CAST(CAST(value AS VARCHAR) AS DOUBLE) AS price,
        |         CAST(props->>'$.k' AS BIGINT) AS volume,
        |         epoch_us(ts)//1000000 AS ts_epoch,
        |         'CSVMock' AS source
        |  FROM events WHERE event_type NOT IN ('view','click')
        |) ORDER BY id""".stripMargin,

    "ref_clean" ->
      """SELECT id, price, GREATEST(0, COALESCE(volume, 0)) AS volume FROM (
        |  SELECT event_id AS id, value AS price,
        |         CAST(props->>'$.k' AS BIGINT) AS volume
        |  FROM events
        |) WHERE price IS NOT NULL AND price > 0
        |ORDER BY id""".stripMargin,

    "ref_sma" ->
      """SELECT id, symbol, price,
        |  CASE WHEN COUNT(*) OVER w = 5
        |       THEN ROUND(AVG(price) OVER w, 6) END AS moving_average
        |FROM (SELECT event_id AS id, user_id AS symbol, value AS price FROM events)
        |WINDOW w AS (PARTITION BY symbol ORDER BY id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY id""".stripMargin,

    "ref_alerts" ->
      """SELECT * FROM (
        |  SELECT id, symbol, price,
        |    CASE WHEN COUNT(*) OVER w = 5
        |         THEN ROUND(AVG(price) OVER w, 6) END AS moving_average
        |  FROM (SELECT event_id AS id, user_id AS symbol, value AS price FROM events)
        |  WINDOW w AS (PARTITION BY symbol ORDER BY id
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |) WHERE moving_average > 108.0
        |ORDER BY id""".stripMargin,

    "ref_pipeline" ->
      """SELECT * FROM (
        |  SELECT id, symbol, price, volume, ts_epoch, source,
        |    CASE WHEN COUNT(*) OVER w = 5
        |         THEN ROUND(AVG(price) OVER w, 6) END AS moving_average
        |  FROM (
        |    SELECT id, symbol, price,
        |           GREATEST(0, COALESCE(volume, 0)) AS volume, ts_epoch, source
        |    FROM (
        |      SELECT event_id AS id, 'u' || CAST(user_id AS VARCHAR) AS symbol,
        |             CAST(CAST(value AS VARCHAR) AS DOUBLE) AS price,
        |             CAST(props->>'$.k' AS BIGINT) AS volume,
        |             epoch_us(ts)//1000000 AS ts_epoch, 'AlphaVantage' AS source
        |      FROM events WHERE event_type = 'view'
        |      UNION ALL
        |      SELECT event_id, 'u' || CAST(user_id AS VARCHAR), value,
        |             CAST(props->>'$.k' AS BIGINT), epoch_us(ts)//1000000,
        |             'WebSocketMock'
        |      FROM events WHERE event_type = 'click'
        |      UNION ALL
        |      SELECT event_id, 'u' || CAST(user_id AS VARCHAR),
        |             CAST(CAST(value AS VARCHAR) AS DOUBLE),
        |             CAST(props->>'$.k' AS BIGINT), epoch_us(ts)//1000000,
        |             'CSVMock'
        |      FROM events WHERE event_type NOT IN ('view','click')
        |    ) WHERE price IS NOT NULL AND price > 0
        |  )
        |  WINDOW w AS (PARTITION BY symbol ORDER BY id
        |               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |) WHERE moving_average > 108.0
        |ORDER BY id""".stripMargin,

    "x_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |           (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "x_top_revenue_orders" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) *
        |           (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "x_brand_volume" ->
      """SELECT p_brand,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "x_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "x_join_semi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "x_join_anti" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,

    "x_topk_per_supplier" ->
      """SELECT * FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
        |  FROM lineitem
        |) WHERE rk <= 3 ORDER BY l_suppkey, rk""".stripMargin,

    "x_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "x_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,

    "x_hourly_events" ->
      """SELECT epoch_us(date_trunc('hour', ts))//1000000 AS bucket_s, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY bucket_s, event_type
        |ORDER BY bucket_s, event_type""".stripMargin,

    "x_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        |  MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "x_running_spend" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
        |  o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE), o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "x_value_bands" ->
      """SELECT band, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events JOIN (
        |  SELECT range AS band, range*50.0 AS lo, (range+1)*50.0 AS hi
        |  FROM range(0,10)
        |) ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin,

    "x_asof_join" ->
      """SELECT t.event_id, t.user_id, t.value,
        |       q.view_value AS asof_view_value,
        |       q.view_event_id AS asof_view_event_id
        |FROM (SELECT event_id, user_id, value FROM events
        |      WHERE event_type = 'click') t
        |ASOF LEFT JOIN (SELECT event_id AS view_event_id, user_id,
        |                       value AS view_value FROM events
        |                WHERE event_type = 'view') q
        |  ON t.user_id = q.user_id AND t.event_id >= q.view_event_id
        |ORDER BY t.event_id""".stripMargin
  )
}
