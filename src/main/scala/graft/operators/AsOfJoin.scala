package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join — the canonical financial enrichment the
  * reference's domain implies (trade ← latest preceding quote) but
  * Spark lacks as a built-in.
  *
  * Implementation is the union-sort trick, NOT a per-row range probe:
  * tag both sides, union them, and for every left row take the
  * last-seen right-side payload via `last(..., ignoreNulls)` over a
  * running window partitioned by key and ordered by the as-of column
  * (right rows sort before left rows at ties → inclusive `<=`
  * semantics). Cost: ONE shuffle on the key + one in-partition sort —
  * the same shape as a sort-merge join, linear in |L|+|R|, no
  * broadcast and no O(|L|·|R|) nested loop, so it scales to 100 TB
  * exactly like any keyed window. (Preference order per the build
  * brief: this composes existing ops — a custom SparkPlan would buy
  * nothing, the physical plan is already minimal.)
  */
object AsOfJoin {

  /** Generic form: for each row of `left`, attach `payload` columns
    * from the latest `right` row with the same `key` and `ord` value
    * <= the left row's (inclusive). `ord` must be unique per key for
    * fully deterministic results (use an event id / sequence number,
    * or tie-break upstream).
    *
    * Payload columns are packed into ONE struct and `last(struct,
    * ignoreNulls)` is taken once, so every output row's payload fields
    * come from the same right row — even when individual payload
    * values are legitimately NULL. (Taking `last` per column would mix
    * fields across right rows and skip null-valued matches.)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ord: String,
           payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    val payloadType = StructType(payload.map(p => StructField(p, right.schema(p).dataType)))
    // Side tag: right=0 sorts before left=1 at equal ord → right rows
    // at the same ord value are visible to the left row (inclusive).
    val l = left.withColumn("__side", lit(1))
      .select(col(key) +: col(ord) +: col("__side") +:
        (leftCols.filterNot(c => c == key || c == ord).map(col) :+
         lit(null).cast(payloadType).as("__payload")): _*)
    val r = right.withColumn("__side", lit(0))
      .select(col(key) +: col(ord) +: col("__side") +:
        (leftCols.filterNot(c => c == key || c == ord).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
         struct(payload.map(col): _*).as("__payload")): _*)
    val w = Window.partitionBy(key).orderBy(col(ord), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val joined = l.unionByName(r)
      .select(
        (Seq(col(key), col(ord), col("__side")) ++
         leftCols.filterNot(c => c == key || c == ord).map(col) :+
         last(col("__payload"), ignoreNulls = true).over(w).as("__last_payload")): _*)
    val unpacked = payload.foldLeft(joined) { (df, p) =>
      df.withColumn(s"asof_$p", col("__last_payload").getField(p))
    }
    unpacked.filter(col("__side") === 1).drop("__side", "__payload", "__last_payload")
  }

  /** Forward (look-ahead) variant: attach the EARLIEST `right` row
    * with `ord` >= the left row's (inclusive) — the other direction a
    * financial as-of join needs (next quote after a trade). Same
    * union-sort shape; the window flips to current-row→following with
    * `first(struct, ignoreNulls)`, and the side tag flips so a right
    * row at the same ord sorts after the left row and stays visible.
    */
  def asOfForward(left: DataFrame, right: DataFrame, key: String, ord: String,
                  payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftCols = left.columns
    val payloadType = StructType(payload.map(p => StructField(p, right.schema(p).dataType)))
    val l = left.withColumn("__side", lit(0))
      .select(col(key) +: col(ord) +: col("__side") +:
        (leftCols.filterNot(c => c == key || c == ord).map(col) :+
         lit(null).cast(payloadType).as("__payload")): _*)
    val r = right.withColumn("__side", lit(1))
      .select(col(key) +: col(ord) +: col("__side") +:
        (leftCols.filterNot(c => c == key || c == ord).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
         struct(payload.map(col): _*).as("__payload")): _*)
    val w = Window.partitionBy(key).orderBy(col(ord), col("__side"))
      .rowsBetween(0, Window.unboundedFollowing)
    val joined = l.unionByName(r)
      .select(
        (Seq(col(key), col(ord), col("__side")) ++
         leftCols.filterNot(c => c == key || c == ord).map(col) :+
         first(col("__payload"), ignoreNulls = true).over(w).as("__first_payload")): _*)
    val unpacked = payload.foldLeft(joined) { (df, p) =>
      df.withColumn(s"asof_$p", col("__first_payload").getField(p))
    }
    unpacked.filter(col("__side") === 0).drop("__side", "__payload", "__first_payload")
  }

  /** Concrete oracle-checked instance over the corpus: treat `click`
    * events as trades and `view` events as quotes; for every click,
    * attach the value of the same user's latest preceding (by
    * event_id, the arrival sequence) view. DuckDB expresses the same
    * thing natively with ASOF JOIN — that's the oracle.
    */
  def clickEnrichedWithLastView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("value").as("view_value"),
              col("event_id").as("view_event_id"))
    asOf(clicks, views, key = "user_id", ord = "event_id",
         payload = Seq("view_value", "view_event_id"))
      .orderBy("event_id")
  }

  /** Tolerance instance: as [[clickEnrichedWithLastView]], but a match
    * staler than `tol` in the as-of ordering is MASKED to null — the
    * max-staleness contract every production point-in-time join
    * carries (a quote from last week must not price today's trade).
    * Masking happens after the same one-shuffle union-sort join; no
    * extra exchange.
    */
  def clickEnrichedWithLastViewWithin(spark: SparkSession, dir: String,
                                      tol: Long = 100): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("value").as("view_value"),
              col("event_id").as("view_event_id"))
    val fresh = col("asof_view_event_id").isNotNull &&
      col("event_id") - col("asof_view_event_id") <= tol
    asOf(clicks, views, key = "user_id", ord = "event_id",
         payload = Seq("view_value", "view_event_id"))
      .select(col("event_id"), col("user_id"), col("value"),
        when(fresh, col("asof_view_value")).as("asof_view_value"),
        when(fresh, col("asof_view_event_id")).as("asof_view_event_id"))
      .orderBy("event_id")
  }

  /** Forward instance: for every click, the same user's NEXT view. */
  def clickEnrichedWithNextView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("value").as("view_value"),
              col("event_id").as("view_event_id"))
    asOfForward(clicks, views, key = "user_id", ord = "event_id",
                payload = Seq("view_value", "view_event_id"))
      .orderBy("event_id")
  }
}
