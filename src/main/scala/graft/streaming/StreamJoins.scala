package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins (SURVEY §2.8 extension — the reference never
  * correlates two streams; each record flows independently through one
  * pipeline, financial_engine.py:358-365). Structured Streaming's
  * interval join is the scalable form: both sides carry watermarks and
  * the join condition bounds event-time distance, so each side's
  * buffered state is a sliding interval, evicted as the watermark
  * advances — without the time bound the engine would have to buffer
  * both streams forever.
  */
object StreamJoins {

  /** Clicks attributed to same-user views within
    * `view_ts <= click_ts <= view_ts + maxDelay` (inner interval
    * join). Input frames carry (user_id, view_id/click_id, *_ts,
    * *_value) columns; both sides get `lateness` watermarks. State per
    * side is O(users x maxDelay-worth of events), hash-partitioned on
    * user_id — the 100 TB shape for funnel/attribution joins. The same
    * function works in batch (watermarks are a no-op there), which is
    * what the stream==batch test exploits.
    */
  def clickViewAttribution(views: DataFrame, clicks: DataFrame,
                           maxDelay: String = "30 minutes",
                           lateness: String = "1 hour",
                           joinType: String = "inner"): DataFrame = {
    val v = views
      .select(col("user_id"), col("view_id"), col("view_ts"), col("view_value"))
      .withWatermark("view_ts", lateness).as("v")
    val c = clicks
      .select(col("user_id"), col("click_id"), col("click_ts"), col("click_value"))
      .withWatermark("click_ts", lateness).as("c")
    // joinType "left_outer" emits unmatched clicks (view columns null)
    // once the watermark proves no matching view can still arrive —
    // outer results are inherently watermark-delayed in streaming.
    c.join(v,
        expr(s"""v.user_id = c.user_id AND
                |click_ts >= view_ts AND
                |click_ts <= view_ts + interval $maxDelay""".stripMargin),
        joinType)
      .select(col("c.user_id").as("user_id"),
        col("click_id"), col("click_ts"), col("click_value"),
        col("view_id"), col("view_ts"), col("view_value"))
  }
}
