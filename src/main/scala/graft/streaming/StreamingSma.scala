package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming formulation of the reference hot path — the reference IS a
  * streaming engine (record-at-a-time asyncio push loop,
  * financial_engine.py:358-377), so batch window functions alone are
  * not parity. Count-based per-key sliding windows are NOT expressible
  * with `groupBy(window(...))` (that is time-based); the per-key
  * deque (`financial_engine.py:298,304-307`) maps to arbitrary
  * stateful processing — `flatMapGroupsWithState` holding the last
  * n prices per key. (Spark 4's transformWithState is the newer API
  * for the same shape; this uses the stable one.)
  *
  * Scale: state is hash-partitioned by key across executors, sized
  * n doubles per live key, checkpointed via the state store — the
  * fault-tolerant version of the reference's in-process dict (which
  * loses everything on restart, financial_engine.py:298).
  */
object StreamingSma {

  /** One normalized tick (unified record schema, financial_engine.py:186-194).
    * `id` is the arrival sequence — ordering within a micro-batch is
    * restored by sorting on it, mirroring the deterministic batch
    * formulation (Window.orderBy(id)).
    *
    * CONTRACT: ids must sort lexicographically in arrival order —
    * fixed-width / zero-padded (what `Sources.normalizeRate` emits).
    * An unpadded numeric suffix ("ws_10" < "ws_2") would silently
    * reorder SMA windows once a batch crosses a digit-length boundary.
    */
  final case class Tick(id: String, symbol: String, price: Double)

  /** Per-key ring of the most recent prices (deque(maxlen=n)). */
  final case class SmaState(prices: List[Double])

  final case class SmaOut(id: String, symbol: String, price: Double,
                          moving_average: Option[Double])

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Emits every tick, with `moving_average` set only once the key has
    * seen >= n prices (warm-up gate, financial_engine.py:308-310) —
    * identical semantics to the batch `RefPipeline.movingAverage`
    * (stream/batch consistency is asserted in StreamingSpec).
    */
  def withMovingAverage(ticks: Dataset[Tick], n: Int): Dataset[SmaOut] = {
    import ticks.sparkSession.implicits._
    ticks
      .groupByKey(_.symbol)
      .flatMapGroupsWithState[SmaState, SmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[Tick], state: GroupState[SmaState]) =>
          val ordered = rows.toSeq.sortBy(_.id)
          var buf = state.getOption.map(_.prices).getOrElse(Nil)
          val out = ordered.map { t =>
            buf = (buf :+ t.price).takeRight(n)
            SmaOut(t.id, t.symbol, t.price,
              if (buf.size == n) Some(round6(buf.sum / n)) else None)
          }
          state.update(SmaState(buf))
          out.iterator
      }
  }

  /** Time-windowed variant (SURVEY §2.8): hourly tumbling counts with
    * a watermark bounding state for late data — the semantics the
    * reference cannot express at all (ingestion-time only,
    * financial_engine.py:191). Batch twin: Analytics.hourlyEventAgg.
    */
  def hourlyCounts(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Streaming twin of the batch gaps-and-islands `Analytics.sessionize`:
    * `session_window(ts, gap)` merges a user's events into one session
    * while each arrives within `gap` of the previous, with the
    * watermark closing (and bounding the state of) sessions once event
    * time passes end + lateness. Boundaries match the batch form
    * except when an inter-event gap equals `gap` exactly: session
    * windows are right-open ([first, last + gap)), so they split at
    * >= gap where the batch form splits at > gap. StreamingSpec
    * asserts stream == batch on a replayed sequence.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("user_id"), col("n_events"), col("sum_value"))
}
