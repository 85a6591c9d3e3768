package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Finance.maxDrawdown]] — the
  * live risk monitor: per-symbol state is the single running peak, and
  * every tick emits its drawdown off that peak with the SAME
  * arithmetic the batch cumulative-max window uses, so streamed
  * drawdowns aggregate to the batch per-symbol maxima exactly
  * (StreamingSpec pins it on the real corpus).
  *
  * Ordering contract: the running peak is SEQUENTIAL state — within a
  * micro-batch rows sort by (ts, id) (the batch window's exact tick
  * order); cross-batch parity needs event-time-ordered feeding, the
  * same honest contract as [[StreamingEma]]. Non-positive prices are
  * skipped exactly as batch filters them.
  *
  * Scale: one double per live symbol key in the state store.
  */
object StreamingDrawdown {

  final case class Tick(symbol: String, id: Long,
                        ts: java.sql.Timestamp, price: Double)

  final case class PeakState(peak: Double)

  final case class DdOut(symbol: String, id: Long, price: Double,
                         peak: Double, dd: Double)

  def withDrawdown(ticks: Dataset[Tick]): Dataset[DdOut] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[PeakState, DdOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sym: String, rows: Iterator[Tick], state: GroupState[PeakState]) =>
          val ordered = rows.toSeq.sortBy(t => (t.ts.getTime, t.id))
          var peak = state.getOption.map(_.peak).getOrElse(0.0)
          val out = ordered.filter(_.price > 0).map { t =>
            peak = math.max(peak, t.price)
            DdOut(sym, t.id, t.price, peak, (peak - t.price) / peak)
          }
          if (peak > 0) state.update(PeakState(peak))
          out.iterator
      }
  }
}
