package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Financial time-series analytics over the normalized quote stream.
  *
  * The reference engine's whole purpose is market-data analytics (its
  * one aggregation is the count-window SMA, financial_engine.py:293-312)
  * — this module is the surface a user of that engine reaches for next:
  * OHLC candlestick bars, VWAP, log-return volatility, drawdown, RSI,
  * and a Benford first-digit audit. Quotes derive from `events` exactly
  * as the reference normalizes its feeds (symbol from the entity id,
  * price from the native numeric, volume from the JSON side-channel —
  * financial_engine.py:114-180): one projection, no UDFs, so every query
  * below stays a pushdown-friendly scan → window/agg Catalyst plan.
  *
  * Scale shape: every window partitions by (symbol[, bar]) — millions of
  * independent series at 100 TB, no global ordering anywhere; the only
  * unbounded-group operation is the 9-row Benford digit rollup.
  * Determinism-for-oracle: tick order is the total order (ts, id);
  * float outputs round(.,6); integer volumes sum exactly.
  */
object Finance {

  /** The normalized quote stream: one row per tick.
    * Column pruning reaches the parquet scan (5 of 6 event columns).
    */
  def quotes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id").as("id"),
        concat(lit("u"), col("user_id")).as("symbol"),
        col("value").as("price"),
        get_json_object(col("props"), "$.k").cast("bigint").as("volume"),
        unix_timestamp(col("ts")).as("ts_epoch"),
        col("ts"))

  /** Daily OHLC candlestick bars per symbol.
    *
    * open/close are picked with two row_numbers over the SAME
    * (symbol, day) partitioning the groupBy then reuses — one exchange
    * total; the `max(when(rn=1))` trick turns "first/last by tick
    * order" into plain hash-agg expressions, so there is no self-join
    * and no min_by/arg_min engine-divergence on ties (tick order
    * (ts, id) is total). At 100 TB: days × symbols bars, each bar built
    * from its own partition slice — embarrassingly parallel.
    */
  def ohlcBars(spark: SparkSession, dir: String): DataFrame = {
    val q = quotes(spark, dir)
      .withColumn("day", to_date(col("ts")))
    val asc  = Window.partitionBy("symbol", "day")
      .orderBy(col("ts_epoch").asc, col("id").asc)
    val desc = Window.partitionBy("symbol", "day")
      .orderBy(col("ts_epoch").desc, col("id").desc)
    q.withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("symbol", "day")
      .agg(
        max(when(col("rn_a") === 1, col("price"))).as("open_price"),
        max(col("price")).as("high_price"),
        min(col("price")).as("low_price"),
        max(when(col("rn_d") === 1, col("price"))).as("close_price"),
        sum(col("volume")).as("bar_volume"),
        count(lit(1)).as("n_ticks"))
      .orderBy("symbol", "day")
  }

  /** Volume-weighted average price per symbol per day. Exact-decimal
    * price·volume sums (volume is an exact BIGINT, price 2-decimal) so
    * both engines aggregate identically; zero-volume bars are dropped
    * rather than divided (ANSI mode). Plain two-key hash-agg: partial
    * map-side combine, one tiny shuffle. */
  def vwap(spark: SparkSession, dir: String): DataFrame =
    quotes(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .groupBy("symbol", "day")
      .agg(
        sum(col("price").cast("decimal(18,6)") * col("volume").cast("decimal(18,6)"))
          .as("pv"),
        sum(col("volume")).as("day_volume"),
        count(lit(1)).as("n_ticks"))
      .filter(col("day_volume") > 0)
      .select(
        col("symbol"), col("day"),
        round(col("pv").cast("double") / col("day_volume"), 6).as("vwap"),
        col("day_volume"), col("n_ticks"))
      .orderBy("symbol", "day")

  /** Per-symbol log-return volatility: r_t = ln(p_t / p_{t-1}) over the
    * total tick order, then stddev_samp per symbol. The lag window and
    * the aggregation share the symbol partitioning (one exchange).
    * Symbols with <2 positive ticks produce no returns and are dropped
    * by the HAVING-style filter — deterministic across engines. */
  def logReturnVolatility(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(col("ts_epoch").asc, col("id").asc)
    quotes(spark, dir)
      .filter(col("price") > 0)
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("ret", log(col("price") / col("prev_price")))
      .groupBy("symbol")
      .agg(
        count(col("ret")).as("n_returns"),
        round(stddev_samp(col("ret")), 6).as("vol"),
        round(avg(col("ret")), 6).as("mean_ret"))
      .filter(col("n_returns") >= 2)
      .orderBy("symbol")
  }

  /** Maximum drawdown per symbol: peak-to-trough decline off the
    * running maximum of the tick-ordered price series. The running max
    * is a rank-less cumulative window (Spark evaluates it streaming
    * within each partition — no per-row rescan), and the final
    * per-symbol rollup reuses the same partitioning. */
  def maxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("symbol")
      .orderBy(col("ts_epoch").asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    quotes(spark, dir)
      .filter(col("price") > 0)
      .withColumn("peak", max(col("price")).over(w))
      .withColumn("dd", (col("peak") - col("price")) / col("peak"))
      .groupBy("symbol")
      .agg(
        round(max(col("dd")), 6).as("max_drawdown"),
        round(max(col("peak")), 6).as("peak_price"),
        count(lit(1)).as("n_ticks"))
      .orderBy("symbol")
  }

  /** 14-period RSI (Cutler's simple-moving-average form — deterministic,
    * no recursive smoothing) per symbol per tick. Emitted only once 14
    * deltas exist (rn >= 15), so the sliding frame is always full and
    * NULL-free. avg gain / (avg gain + avg loss) avoids the divide-by-
    * zero of the classic gain/loss ratio; an all-flat window (both
    * averages zero) is the conventional RSI 50. One partitioning
    * (symbol) serves the lag, the row_number, and both sliding frames. */
  def rsi(spark: SparkSession, dir: String): DataFrame = {
    val ord   = Window.partitionBy("symbol").orderBy(col("ts_epoch").asc, col("id").asc)
    val frame = ord.rowsBetween(-13, 0)
    quotes(spark, dir)
      .withColumn("rn", row_number().over(ord))
      .withColumn("delta", col("price") - lag(col("price"), 1).over(ord))
      .withColumn("gain", greatest(col("delta"), lit(0.0)))
      .withColumn("loss", greatest(-col("delta"), lit(0.0)))
      .withColumn("avg_gain", avg(col("gain")).over(frame))
      .withColumn("avg_loss", avg(col("loss")).over(frame))
      .filter(col("rn") >= 15)
      .select(
        col("symbol"), col("id"), col("price"),
        round(
          when(col("avg_gain") + col("avg_loss") === 0, lit(50.0))
            .otherwise(lit(100.0) * col("avg_gain") / (col("avg_gain") + col("avg_loss"))),
          6).as("rsi14"))
      .orderBy("symbol", "id")
  }

  /** Top day-over-day VWAP movers: the market-screen query. Builds on
    * [[vwap]]'s round-6 dailies (engine-exact, so the percent change
    * divides identical doubles), lags within each symbol, and takes
    * the global top-k by |change| via TakeOrdered — never a global
    * window over the (symbol, day) matrix. Ties break on
    * (symbol, day) so the cut is total-ordered.
    */
  def topMovers(spark: SparkSession, dir: String, topK: Int = 10): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("day")
    val daily = vwap(spark, dir)
      .select("symbol", "day", "vwap")
      .withColumn("prev_vwap", lag(col("vwap"), 1).over(w))
      .filter(col("prev_vwap").isNotNull && col("prev_vwap") =!= 0)
      .withColumn("pct_change",
        round((col("vwap") - col("prev_vwap")) / col("prev_vwap"), 6))
    val top = daily
      .orderBy(abs(col("pct_change")).desc, col("symbol"), col("day"))
      .limit(topK)
    broadcast(top)
      .withColumn("rk", row_number().over(
        Window.orderBy(abs(col("pct_change")).desc, col("symbol"), col("day")))
        .cast("bigint"))
      .select("rk", "symbol", "day", "prev_vwap", "vwap", "pct_change")
      .orderBy("rk")
  }

  /** Pairwise return correlation across the most-traded symbols — the
    * co-movement screen. The symbol universe is capped at the top
    * `nSymbols` by tick count (TakeOrdered, broadcast back), so the
    * pair fan-out is nSymbols², a CONSTANT chosen by the analyst —
    * never all-symbols². Daily means are exact-decimal averages
    * (identical doubles in both engines); the self-join aligns pairs
    * on shared days only.
    */
  def pairCorrelation(spark: SparkSession, dir: String,
                      nSymbols: Int = 10, minDays: Int = 10): DataFrame = {
    val daily = quotes(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .groupBy("symbol", "day")
      .agg((sum(col("price").cast("decimal(18,6)")).cast("double") /
            count(lit(1))).as("mean_price"),
           count(lit(1)).as("n_ticks"))
      .localCheckpoint()
    val top = daily.groupBy("symbol").agg(sum(col("n_ticks")).as("total"))
      .orderBy(col("total").desc, col("symbol")).limit(nSymbols)
      .select("symbol")
    val universe = daily.join(broadcast(top), "symbol")
      .select("symbol", "day", "mean_price")
    universe.as("a").join(universe.as("b"),
        col("a.day") === col("b.day") && col("a.symbol") < col("b.symbol"))
      .groupBy(col("a.symbol").as("sym_a"), col("b.symbol").as("sym_b"))
      .agg(count(lit(1)).as("n_days"),
           round(corr(col("a.mean_price"), col("b.mean_price")), 6).as("price_corr"))
      .filter(col("n_days") >= minDays)
      .orderBy("sym_a", "sym_b")
  }

  /** 20-tick Bollinger bands with breach flags. The band edges are
    * built from the ROUNDED sma/stddev (round-6 first, then the ±2σ
    * arithmetic, then round again), so the breach comparisons test
    * price against bit-identical edges in both engines — no float
    * boundary can flip a flag. Emitted only at a full 20-tick frame
    * (rn >= 20). Same single (symbol) partitioning as the RSI family.
    */
  def bollinger(spark: SparkSession, dir: String, nTicks: Int = 20): DataFrame = {
    val ord   = Window.partitionBy("symbol").orderBy(col("ts_epoch").asc, col("id").asc)
    val frame = ord.rowsBetween(-(nTicks - 1), 0)
    quotes(spark, dir)
      .withColumn("rn", row_number().over(ord))
      .withColumn("sma20", round(avg(col("price")).over(frame), 6))
      .withColumn("sd20", round(stddev_samp(col("price")).over(frame), 6))
      .filter(col("rn") >= nTicks)
      .withColumn("upper_band", round(col("sma20") + col("sd20") * 2, 6))
      .withColumn("lower_band", round(col("sma20") - col("sd20") * 2, 6))
      .select(col("symbol"), col("id"), col("price"), col("sma20"),
        col("upper_band"), col("lower_band"),
        (col("price") > col("upper_band")).as("breach_up"),
        (col("price") < col("lower_band")).as("breach_dn"))
      .orderBy("symbol", "id")
  }

  /** Benford first-significant-digit audit of order totals — the
    * classic fraud screen. The digit is extracted from the integer
    * cents STRING (no float log10 at bin boundaries), so binning is
    * exact in both engines; expected mass is log10(1 + 1/d). The
    * grand-total window runs over the 9-row aggregate, not the fact
    * table — bounded at any scale. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 0)
      .select(
        substring(round(col("o_totalprice") * 100).cast("bigint").cast("string"), 1, 1)
          .cast("bigint").as("digit"))
      .groupBy("digit")
      .agg(count(lit(1)).as("n_orders"))
    val total = Window.partitionBy()
    digits
      .withColumn("obs_freq", round(col("n_orders") / sum(col("n_orders")).over(total), 6))
      .withColumn("exp_freq", round(log10(lit(1.0) + lit(1.0) / col("digit")), 6))
      .withColumn("abs_dev", round(abs(col("obs_freq") - col("exp_freq")), 6))
      .select("digit", "n_orders", "obs_freq", "exp_freq", "abs_dev")
      .orderBy("digit")
  }

  /** Lag-1 autocorrelation of per-symbol tick log-returns — the
    * mean-reversion/momentum diagnostic (negative ACF(1) = reverting
    * series, positive = trending) that completes the volatility/
    * drawdown/RSI risk panel. Returns derive exactly as in
    * [[logReturnVolatility]]; the lagged pair shares the SAME (symbol)
    * window partitioning, so the lag, the second lag, and the final
    * rollup ride one exchange. `corr` is the order-sensitive double
    * pair of the panel — rounded at 6 like x_stats_corr (the tracked
    * tolerance class). Symbols with <3 return pairs are dropped
    * (corr undefined / degenerate) — deterministic across engines.
    */
  def autocorr(spark: SparkSession, dir: String, lagN: Int = 1): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy(col("ts_epoch").asc, col("id").asc)
    quotes(spark, dir)
      .filter(col("price") > 0)
      .withColumn("prev_price", lag(col("price"), 1).over(w))
      .withColumn("ret", log(col("price") / col("prev_price")))
      .withColumn("ret_lag", lag(col("ret"), lagN).over(w))
      .filter(col("ret").isNotNull && col("ret_lag").isNotNull)
      .groupBy("symbol")
      .agg(count(lit(1)).as("n_pairs"),
           round(corr(col("ret"), col("ret_lag")), 6).as("acf1"),
           stddev_samp(col("ret")).as("sd_ret"),
           stddev_samp(col("ret_lag")).as("sd_lag"))
      // Zero-variance groups (constant price) are degenerate: Spark's
      // corr yields NaN where DuckDB yields NULL, so the engines would
      // diverge on exactly that input. Drop them on BOTH sides — the
      // same determinism contract as the n_pairs >= 3 floor.
      .filter(col("n_pairs") >= 3 && col("sd_ret") > 0 && col("sd_lag") > 0)
      .drop("sd_ret", "sd_lag")
      .orderBy("symbol")
  }
}
