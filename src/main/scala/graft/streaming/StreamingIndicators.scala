package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twins of the two sliding-frame indicators
  * [[graft.operators.Finance.rsi]] (Cutler 14-period) and
  * [[graft.operators.Finance.bollinger]] (20-tick bands) — the
  * [[StreamingEma]] ring-state shape: per-symbol rings of the most
  * recent frame values, each arriving tick emitting the SAME
  * arithmetic the batch window computes, bit for bit:
  *
  *  - batch `avg(x).over(frame)` is a double sum in frame row order
  *    divided by the count — the twins fold the ring oldest-first;
  *  - batch `stddev_samp(x).over(frame)` is Spark's CentralMomentAgg
  *    Welford recurrence (newN = n+1; delta = x − avg; deltaN =
  *    delta/newN; avg += deltaN; m2 += delta·(delta − deltaN)) run
  *    over the frame rows in order — the twins run the identical
  *    recurrence, so the rounded band edges cannot diverge;
  *  - every rounded output applies round-6 HALF_UP exactly where the
  *    batch expression does (Bollinger rounds sma/sd FIRST, then the
  *    ±2σ arithmetic, then rounds again — the twin mirrors that
  *    sequencing).
  *
  * Ordering contract (same as [[StreamingEma]]): sliding frames are
  * SEQUENTIAL state — rows sort by (ts, id) within each micro-batch,
  * but a late tick from before consumed history would need
  * retraction; feed event-time-ordered input (or front a watermarked
  * sort) for cross-batch parity.
  *
  * Scale: state per live symbol is one ring of ≤ 14 doubles (RSI
  * deltas) or ≤ 20 doubles (Bollinger prices) plus two scalars —
  * hash-partitioned across executors, checkpointed in the state
  * store; emission is 1:1 with input after warm-up.
  */
object StreamingIndicators {

  final case class Tick(symbol: String, id: Long,
                        ts: java.sql.Timestamp, price: Double)

  /** prev price (for the next delta), ring of the last ≤14 deltas
    * oldest-first, ticks seen. */
  final case class RsiState(prev: Double, deltas: List[Double], n: Long)

  final case class RsiOut(symbol: String, id: Long, price: Double, rsi14: Double)

  /** ring of the last ≤20 prices oldest-first, ticks seen. */
  final case class BollState(prices: List[Double], n: Long)

  final case class BollOut(symbol: String, id: Long, price: Double,
                           sma20: Double, upper_band: Double, lower_band: Double,
                           breach_up: Boolean, breach_dn: Boolean)

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark's StddevSamp over a window frame: the CentralMomentAgg
    * recurrence in frame row order, then sqrt(m2 / (n − 1)).
    */
  private def stddevSamp(xs: Seq[Double]): Double = {
    var n = 0.0; var avg = 0.0; var m2 = 0.0
    xs.foreach { x =>
      n += 1.0
      val delta = x - avg
      val deltaN = delta / n
      avg += deltaN
      m2 += delta * (delta - deltaN)
    }
    math.sqrt(m2 / (n - 1.0))
  }

  def withRsi(ticks: Dataset[Tick], period: Int = 14): Dataset[RsiOut] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[RsiState, RsiOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Tick], state: GroupState[RsiState]) =>
          val ordered = rows.toSeq.sortBy(t => (t.ts.getTime, t.id))
          var st = state.getOption.getOrElse(RsiState(Double.NaN, Nil, 0L))
          val out = Seq.newBuilder[RsiOut]
          ordered.foreach { t =>
            val n = st.n + 1
            val deltas =
              if (st.n == 0) Nil
              else (st.deltas :+ (t.price - st.prev)).takeRight(period)
            st = RsiState(t.price, deltas, n)
            // batch gate rn >= period + 1: the frame holds `period`
            // non-null deltas exactly
            if (n >= period + 1) {
              // avg over the frame: double sum in frame order / count
              val ag = deltas.map(d => math.max(d, 0.0)).sum / period
              val al = deltas.map(d => math.max(-d, 0.0)).sum / period
              val rsi =
                if (ag + al == 0.0) 50.0
                else 100.0 * ag / (ag + al)
              out += RsiOut(t.symbol, t.id, t.price, round6(rsi))
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  def withBollinger(ticks: Dataset[Tick], nTicks: Int = 20): Dataset[BollOut] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[BollState, BollOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Tick], state: GroupState[BollState]) =>
          val ordered = rows.toSeq.sortBy(t => (t.ts.getTime, t.id))
          var st = state.getOption.getOrElse(BollState(Nil, 0L))
          val out = Seq.newBuilder[BollOut]
          ordered.foreach { t =>
            val prices = (st.prices :+ t.price).takeRight(nTicks)
            val n = st.n + 1
            st = BollState(prices, n)
            if (n >= nTicks) {
              // the batch expression sequence: round sma/sd FIRST,
              // then the ±2σ arithmetic, then round the edges
              val sma = round6(prices.sum / nTicks)
              val sd = round6(stddevSamp(prices))
              val upper = round6(sma + sd * 2)
              val lower = round6(sma - sd * 2)
              out += BollOut(t.symbol, t.id, t.price, sma, upper, lower,
                t.price > upper, t.price < lower)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
