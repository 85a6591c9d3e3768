package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.Finance

/** Financial time-series family: value invariants on the driver corpus
  * plus the plan shapes the 100 TB design depends on (every query is a
  * single (symbol[, day]) hash exchange shared by its windows and its
  * final aggregation — no joins, no global windows over fact rows).
  */
class FinanceSpec extends SparkSuite {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def hashExchanges(df: DataFrame): Int =
    formatted(df).linesIterator.count(_.contains("Arguments: hashpartitioning"))

  test("OHLC bars: open/close bracketed by low/high, volume conserved") {
    val bars = Finance.ohlcBars(spark, sfDir).cache()
    try {
      val bad = bars.filter(
        col("open_price") > col("high_price") || col("open_price") < col("low_price") ||
        col("close_price") > col("high_price") || col("close_price") < col("low_price") ||
        col("low_price") > col("high_price")).count()
      assert(bad === 0)
      // every tick lands in exactly one bar
      val ticks = bars.agg(sum("n_ticks")).head.getLong(0)
      assert(ticks === Tables.events(spark, sfDir).count())
      // single-tick bars are degenerate: open = high = low = close
      val deg = bars.filter(col("n_ticks") === 1 &&
        (col("open_price") =!= col("close_price") ||
         col("high_price") =!= col("low_price"))).count()
      assert(deg === 0)
    } finally bars.unpersist()
  }

  test("OHLC/vwap/volatility/drawdown/rsi: one hash exchange each (windows and agg share the key)") {
    assert(hashExchanges(Finance.ohlcBars(spark, sfDir)) === 1)
    assert(hashExchanges(Finance.vwap(spark, sfDir)) === 1)
    assert(hashExchanges(Finance.logReturnVolatility(spark, sfDir)) === 1)
    assert(hashExchanges(Finance.maxDrawdown(spark, sfDir)) === 1)
    assert(hashExchanges(Finance.rsi(spark, sfDir)) === 1)
  }

  test("vwap sits inside each bar's [low, high] envelope") {
    val bars = Finance.ohlcBars(spark, sfDir)
    val v    = Finance.vwap(spark, sfDir)
    val bad = v.join(bars, Seq("symbol", "day"))
      .filter(col("vwap") < col("low_price") - 1e-6 ||
              col("vwap") > col("high_price") + 1e-6)
      .count()
    assert(bad === 0)
  }

  test("drawdown is a fraction of peak in [0, 1); peak is the series max") {
    val dd = Finance.maxDrawdown(spark, sfDir)
    assert(dd.filter(col("max_drawdown") < 0 || col("max_drawdown") >= 1).count() === 0)
    val priceMax = Finance.quotes(spark, sfDir).filter(col("price") > 0)
      .groupBy("symbol").agg(max("price").as("pmax"))
    val bad = dd.join(priceMax, "symbol")
      .filter(abs(col("peak_price") - round(col("pmax"), 6)) > 1e-6).count()
    assert(bad === 0)
  }

  test("RSI stays in [0, 100] and needs exactly 14 deltas of warm-up") {
    val r = Finance.rsi(spark, sfDir).cache()
    try {
      assert(r.filter(col("rsi14") < 0 || col("rsi14") > 100).count() === 0)
      // warm-up gate: per symbol, emitted rows = max(0, n_ticks - 14)
      val perSym = Finance.quotes(spark, sfDir)
        .groupBy("symbol").agg(count(lit(1)).as("n"))
      val emitted = r.groupBy("symbol").agg(count(lit(1)).as("m"))
      val bad = perSym.join(emitted, Seq("symbol"), "left")
        .filter(coalesce(col("m"), lit(0L)) =!= greatest(col("n") - 14, lit(0L)))
        .count()
      assert(bad === 0)
    } finally r.unpersist()
  }

  test("Benford digit audit: 9 digits, frequencies sum to ~1 on both axes") {
    // plan shape first — the window that computes the total runs over
    // the 9-row aggregate, never the fact table (checked before cache()
    // so InMemoryRelation doesn't double-count the exchanges)
    val plan = formatted(Finance.benfordDigits(spark, sfDir))
    assert(plan.contains("SinglePartition"), plan)
    assert(plan.linesIterator.count(_.contains("Arguments: hashpartitioning")) === 1, plan)
    val b = Finance.benfordDigits(spark, sfDir).cache()
    try {
      assert(b.count() <= 9)
      assert(b.filter(col("digit") < 1 || col("digit") > 9).count() === 0)
      val Array(obs, exp) = b.agg(sum("obs_freq"), sum("exp_freq"))
        .head().toSeq.map(_.asInstanceOf[Double]).toArray
      assert(math.abs(obs - 1.0) < 1e-4, s"obs mass $obs")
      assert(math.abs(exp - 1.0) < 1e-4, s"exp mass $exp")
    } finally b.unpersist()
  }
}
