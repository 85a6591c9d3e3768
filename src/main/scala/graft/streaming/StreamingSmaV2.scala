package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TTLConfig, ValueState}

import graft.streaming.StreamingSma.{SmaOut, Tick}

/** transformWithState (Spark 4 arbitrary-state API v2) formulation of
  * the count-based SMA — same semantics as
  * [[StreamingSma.withMovingAverage]] (flatMapGroupsWithState), using
  * the newer processor API: explicit state handles with per-state
  * encoders and TTL support, RocksDB-backed. Kept alongside the v1
  * operator so both API generations are covered; the test suite
  * asserts both produce the batch window answer.
  */
object StreamingSmaV2 {

  /** State wrapper (needs a product encoder for the state store). */
  final case class PriceBuffer(values: List[Double])

  class SmaProcessor(n: Int, ttl: Option[java.time.Duration] = None)
      extends StatefulProcessor[String, Tick, SmaOut] {
    @transient private var buffer: ValueState[PriceBuffer] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buffer = getHandle.getValueState[PriceBuffer](
        "prices", Encoders.product[PriceBuffer],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(key: String, inputRows: Iterator[Tick],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[SmaOut] = {
      val ordered = inputRows.toSeq.sortBy(_.id)
      var buf = Option(buffer.get()).map(_.values).getOrElse(Nil)
      val out = ordered.map { t =>
        buf = (buf :+ t.price).takeRight(n)
        SmaOut(t.id, t.symbol, t.price,
          if (buf.size == n)
            Some(BigDecimal(buf.sum / n).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
          else None)
      }
      buffer.update(PriceBuffer(buf))
      out.iterator
    }
  }

  /** Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`); see
    * StreamingSpec for the session wiring.
    *
    * `ttl` bounds per-key state lifetime (SURVEY §2.8: the reference's
    * keyed state is unbounded in key cardinality and never expires,
    * financial_engine.py:298 — at scale that is a leak, since a symbol
    * that stops ticking holds its window forever). With a TTL, an idle
    * key's buffer is dropped after `ttl` of processing time and the
    * warm-up gate restarts from zero when the key reappears — the same
    * semantics as a fresh key, which is exactly what the reference
    * does after a restart. TTL requires processing-time mode; without
    * one the processor runs in TimeMode.None as before.
    */
  def withMovingAverage(ticks: Dataset[Tick], n: Int,
                        ttl: Option[java.time.Duration] = None): Dataset[SmaOut] = {
    import ticks.sparkSession.implicits._
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ticks
      .groupByKey(_.symbol)
      .transformWithState(new SmaProcessor(n, ttl), timeMode, OutputMode.Append())
  }
}
