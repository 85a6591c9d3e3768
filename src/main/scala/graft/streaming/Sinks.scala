package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

/** Observer-pattern sink fan-out (K1-K4, financial_engine.py:59-110),
  * Spark-first: one micro-batch is persisted once and delivered to
  * every attached sink inside a single `foreachBatch` — the analog of
  * `Subject.notify` walking its observer list (:76-83). Per-sink
  * exceptions are swallowed exactly like the reference swallows
  * per-observer exceptions (:82-83): one bad sink must not poison the
  * others or the query.
  *
  * Spark rows are immutable, so the reference's defensive
  * `copy.deepcopy` before each observer (:81) has no analog — isolation
  * is free.
  */
object Sinks {

  /** Ported config keys (ConfigurationManager, financial_engine.py:25-42). */
  final case class Config(
      logLevel: String = "INFO",          // financial_engine.py:40
      alertThreshold: Double = 108.0)     // financial_engine.py:39

  type Sink = DataFrame => Unit

  /** K1 ConsoleNotifier (:85-88). */
  def console(maxRows: Int = 5): Sink = _.show(maxRows, truncate = false)

  /** K2 LoggingModule — delivers iff log_level == "INFO" (:90-95). */
  def logging(cfg: Config, log: String => Unit = println): Sink = df =>
    if (cfg.logLevel == "INFO") log(s"[graft] batch with ${df.count()} events")

  /** K3 AlertGenerator — strict `>` threshold predicate (:100-106)
    * feeding a downstream handler. Alerts are a filtered trickle by
    * design, but the collect is still driver-side: `maxAlerts` bounds
    * it so a mis-set threshold can never OOM the driver. The cap is
    * deterministic (ordered by id before the limit — an unordered
    * limit keeps an arbitrary subset) and overflow is REPORTED via
    * `onOverflow` — hitting the cap is the signal to move the handler
    * into a distributed writer, so it must never pass silently.
    */
  def alerts(cfg: Config, handler: Array[Row] => Unit,
             maxAlerts: Int = 10000,
             onOverflow: Int => Unit = cap => System.err.println(
               s"[graft] alert sink overflow: batch exceeded $cap alerts; " +
               "excess dropped — route alerts to a distributed sink")): Sink = df => {
    // fetch cap+1: one extra row is the cheapest exact overflow test
    val hits = df.filter(col("moving_average") > cfg.alertThreshold)
      .orderBy("id")
      .limit(maxAlerts + 1).collect()
    if (hits.length > maxAlerts) {
      onOverflow(maxAlerts)
      handler(hits.take(maxAlerts))
    } else handler(hits)
  }

  /** K4 Subject.notify — deliver one cached batch to every sink,
    * swallowing per-sink failures (:79-83). NonFatal only: the
    * reference swallows `Exception`, not errors — a fatal JVM
    * condition (OOM, thread interrupt) must propagate and fail the
    * query rather than be reported as a delivered batch. */
  def fanOut(sinks: Seq[Sink])(batch: DataFrame, batchId: Long): Unit = {
    batch.persist()
    try sinks.foreach { s =>
      try s(batch)
      catch { case scala.util.control.NonFatal(e) =>
        // reference behavior: log and continue (financial_engine.py:82-83)
        System.err.println(s"[graft] sink failed on batch $batchId: ${e.getMessage}")
      }
    } finally batch.unpersist()
  }

  /** Observer attach/detach registry (financial_engine.py:68-74): the
    * reference mutates its observer list while the engine runs; here
    * each micro-batch reads the CURRENT sink set, so `detach` takes
    * effect from the next batch without restarting the query.
    */
  final class SinkRegistry {
    @volatile private var sinks: Vector[Sink] = Vector.empty
    def attach(s: Sink): this.type = synchronized { sinks = sinks :+ s; this }
    def detach(s: Sink): this.type =
      synchronized { sinks = sinks.filterNot(_ eq s); this }
    def current: Seq[Sink] = sinks
  }

  /** Wire a stream through the fan-out; caller starts/stops the query. */
  def attach(stream: Dataset_, sinks: Seq[Sink]): DataStreamWriter[Row] =
    stream.toDF().writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => fanOut(sinks)(b, id))

  /** Registry variant: sink membership is re-read per batch. */
  def attach(stream: Dataset_, registry: SinkRegistry): DataStreamWriter[Row] =
    stream.toDF().writeStream.outputMode("append")
      .foreachBatch((b: DataFrame, id: Long) => fanOut(registry.current)(b, id))

  private type Dataset_ = org.apache.spark.sql.Dataset[_]
}
