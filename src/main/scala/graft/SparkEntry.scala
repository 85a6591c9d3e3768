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
        .orderBy("id"))
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
        |ORDER BY id""".stripMargin
  )
}
