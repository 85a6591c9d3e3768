package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamingSma.{SmaOut, Tick}

/** End-to-end engine lifecycle (E1-E3, financial_engine.py:329-433):
  * assemble clean → SMA → sink fan-out over a stream of ticks, start,
  * await, stop. The reference's ctor/`start()`/`stop()` machinery
  * (task spawning, cancellation, adapter close) collapses into
  * Structured Streaming's own lifecycle — `start()` returns a
  * `StreamingQuery`, `stop()` cancels it, checkpointing replaces the
  * nothing-survives-restart semantics of the in-process engine.
  */
object StreamingEngine {

  final case class EngineConfig(
      movingAverageWindow: Int = 5,                 // financial_engine.py:38
      sinks: Sinks.Config = Sinks.Config())

  /** The processing graph, source-agnostic: validity filter + clamp
    * (F2) → count-based SMA with warm-up gate (A1). Pure function of
    * the input stream — identical code path for MemoryStream tests,
    * the rate source, or a real feed.
    */
  def process(ticks: Dataset[Tick], cfg: EngineConfig): Dataset[SmaOut] = {
    import ticks.sparkSession.implicits._
    val cleaned = ticks.filter(t => t.price > 0) // F2; volume clamp lives in the untyped path
    StreamingSma.withMovingAverage(cleaned, cfg.movingAverageWindow)
  }

  /** Wire the graph to the observer fan-out and start the query. */
  def start(ticks: Dataset[Tick], cfg: EngineConfig,
            extraSinks: Seq[Sinks.Sink] = Nil): StreamingQuery = {
    val sinks = Seq(Sinks.console(), Sinks.logging(cfg.sinks)) ++ extraSinks
    Sinks.attach(process(ticks, cfg), sinks).start()
  }
}
