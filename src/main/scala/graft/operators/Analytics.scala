package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Extended analytics surface (SURVEY §2.3-2.7 "absent in reference"
  * categories + §7 step 3): the query capabilities a user of a real
  * analytics engine needs at 100 TB, all expressed as declarative
  * Catalyst plans so pushdown/pruning/AQE apply.
  *
  * Determinism-for-oracle conventions (FIXTURES.md):
  *  - big float sums go through DECIMAL(18,6)/DECIMAL(38,6) so both
  *    engines aggregate exactly, then cast back to DOUBLE;
  *  - averages are exact-decimal sums divided by counts in DOUBLE;
  *  - every output has a unique-key ORDER BY.
  *
  * Scale notes are on each operator.
  */
object Analytics {

  /** Exact-decimal sum of a double expression, surfaced as double.
    * DECIMAL(18,6) input bound is safe for this corpus (values < 1e6,
    * 2 decimal digits); sums widen to DECIMAL(38,x) which holds ~1e32 —
    * ample at 100 TB row counts.
    */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,6)")).cast("double")

  /** TPC-H Q1-style pricing summary: the canonical scan→hash-agg —
    * partial (map-side) aggregation then a tiny shuffle of one row per
    * (flag, status) group per partition. At 100 TB the shuffle carries
    * only #partitions × #groups rows, so this is scan-bound; the
    * shipdate filter and 7-column projection reach the parquet scan
    * (verified via explain: PushedFilters + ReadSchema).
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,6)") *
            (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
          .cast("double").as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: 3-way join + agg + top-k. customer is small
    * relative to fact tables — the planner broadcasts it from its
    * measured size (no hard hint: customer GROWS with the corpus, and
    * a hint-forced broadcast cannot degrade when it outgrows the
    * threshold; the size-based choice falls back to a shuffled join).
    * orders⋈lineitem is the big equi-join, shuffled on orderkey (at
    * scale: bucket both by orderkey to eliminate it). Top-10 via
    * orderBy+limit = Spark TakeOrderedAndProject — no global sort
    * materialization.
    */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15 00:00:00")))
    val li   = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15 00:00:00")))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)") *
               (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
             .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Exact equi-depth histogram over lineitem price — the
    * optimizer-statistics primitive (equal ROW MASS per bucket;
    * equi-width histograms starve under skew, which is why engine
    * cost models ship equi-depth). Ranking rides the distributed
    * global-rank backbone ([[CorpusOps.withGlobalRank]]:
    * per-partition row_number + collected per-partition offsets —
    * never a single-reducer window), with ties broken by the
    * (orderkey, linenumber) unique key so the binning is a total
    * order both engines reproduce exactly; bucket = ((rank−1)·B)
    * div n. Output per bucket: row count and [lo, hi] value bounds —
    * the boundary table a cost model consumes.
    */
  def equidepthHistogram(spark: SparkSession, dir: String,
                         buckets: Int = 16): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_extendedprice").as("v"),
              col("l_orderkey"), col("l_linenumber"))
    val (ranked, total) = CorpusOps.withGlobalRank(
      li, Seq(col("v"), col("l_orderkey"), col("l_linenumber")), "rk")
    ranked
      .withColumn("bucket", expr(s"((rk - 1) * $buckets) div $total"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
           min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("bucket")
  }

  /** TPC-H Q19-class disjunctive-predicate revenue: three OR'd
    * (brand, size-range, quantity-range) branches over part⋈lineitem.
    * The join stays a pure partkey equi-join with the disjunction as
    * the join filter; Catalyst extracts the part-only disjunction
    * ((brand∧size) ∨ (brand∧size) ∨ (brand∧size)) and pushes it INTO
    * the part scan as an Or PushedFilter (pinned in PlanSpec) — the
    * classic Q19 planner exercise: at 100 TB the part side arrives
    * pre-filtered at the row-group level, and the quantity branches
    * prune lineitem rows before the aggregate. Revenue is the
    * decimal-exact sum of the Q3/Q5 family; one row out.
    */
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    val branches =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
        col("l_quantity").between(20, 30))
    li.join(p, li("l_partkey") === p("p_partkey") && branches)
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,6)") *
            (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
          .cast("double").as("revenue"))
  }

  /** Broadcast-join: fact ⋈ small dim — no shuffle of the 100 TB
    * side, each task streams its lineitem split against an in-memory
    * hash of part. The broadcast is SIZE-CHOSEN (planner stats + AQE),
    * not hint-forced: part grows with the corpus, and a hard hint
    * cannot degrade when part outgrows the threshold — the size-based
    * choice falls back to a shuffled hash join with the query shape
    * unchanged (PlanSpec pins the broadcast at this scale).
    */
  def brandVolume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_items"))
      .orderBy("p_brand")
  }

  /** Shuffle (sort-merge) join of the two big tables + agg: line-item
    * count and revenue per order priority. At scale both sides
    * hash-partition on orderkey; with bucketed storage this becomes a
    * zero-shuffle merge join. (No broadcast hint on purpose — this is
    * the big-big join shape.)
    */
  def orderPriorityCount(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority")
    val li  = Tables.lineitem(spark, dir).select("l_orderkey", "l_extendedprice")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_items"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("o_orderpriority")
  }

  /** Left-semi join: customers having at least one finished order —
    * EXISTS without duplicate explosion; Spark builds/streams only
    * keys of the right side.
    */
  def customersWithOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Left-anti join: customers who never placed a large (>400k) order —
    * NOT EXISTS. (Unfiltered "no orders at all" is empty in this corpus,
    * which would be a vacuous correctness check.)
    */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000.0)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Top-k per group via ranked row-frame window: top-3 line items per
    * supplier by extended price. One shuffle on the partition key; the
    * per-partition sort is the cost at scale, and a skewed supplier is
    * its skew axis: a window partition must be COLOCATED, so AQE
    * cannot split it (skew handling applies to joins, not windows).
    * The skew rescue is the typed-aggregator form
    * ([[topkPerSupplierAgg]]): its O(k) partial buffers reduce every
    * input partition map-side BEFORE the shuffle, so a hot key's work
    * splits across however many partitions carry its rows —
    * plan-asserted in PlanSpec, and benched ~1.5x faster here with the
    * gap widening with rows-per-key. Deterministic tie-breaks:
    * (price desc, orderkey, linenumber).
    */
  def topkPerSupplier(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .orderBy("l_suppkey", "rk")
  }

  /** ROLLUP hierarchy agg: (flag, status) → (flag) → (). grouping_id
    * disambiguates real NULL group keys from rollup subtotal rows.
    * Same partial-agg shuffle shape as Q1 (Spark expands grouping sets
    * map-side).
    */
  def returnFlagRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup("l_returnflag", "l_linestatus")
      .agg(
        grouping_id().cast("bigint").as("gid"),
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))

  /** CUBE over (orderstatus, orderpriority): all 4 grouping sets. */
  def orderStatusCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        grouping_id().cast("bigint").as("gid"),
        dsum(col("o_totalprice")).as("sum_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))

  /** Tumbling time-window aggregation over the event stream (batch
    * formulation of SURVEY §2.8 time windows): hourly bucket per
    * event_type. Bucket surfaced as epoch seconds BIGINT so both
    * engines compare integers, not timestamp encodings. In streaming
    * this is exactly `groupBy(window($"ts","1 hour"), $"event_type")`
    * with a watermark; the batch plan shares the column expressions.
    */
  def hourlyEventAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("bucket_s"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("bucket_s", "event_type")

  /** MapType path for semi-structured data: parse props ONCE with
    * from_json into map<string,bigint> then read fields from the map —
    * the right shape when several fields are consumed (get_json_object
    * re-parses the string per field; see [[jsonPropsAgg]] for that
    * variant).
    */
  def jsonMapAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        // map<string,string> + per-field try_cast, NOT map<string,long>:
        // with a typed value a single non-integer prop value nulls the
        // ENTIRE map (losing n_keys too), silently diverging from the
        // oracle's len(json_keys(props)) if the corpus schema ever
        // widens. String values keep key counting independent of value
        // types; the cast mirrors the get_json_object path.
        from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType)).as("m"))
      .select(col("event_type"),
        size(map_keys(col("m"))).cast("bigint").as("n_keys"),
        element_at(col("m"), "k").try_cast("bigint").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           max(col("n_keys")).as("max_keys"),
           sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  /** Semi-structured extraction: pull `k` out of the props JSON column
    * and aggregate per event_type. `get_json_object` is codegen'd; at
    * scale prefer parsing once with `from_json` into a struct column
    * when several fields are read.
    */
  def jsonPropsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** Running (cumulative) per-customer spend — unbounded-preceding
    * row-frame window. Decimal-cast inside the windowed sum keeps the
    * prefix sums exact in both engines regardless of association
    * order. One shuffle on custkey.
    */
  def runningCustomerSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
              col("o_orderdate").cast("date").as("o_orderdate"), col("o_totalprice"))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double"))
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  /** Range (theta band) join: events against a derived value-band dim.
    * The band table is tiny → broadcast nested-loop, which is the
    * right physical plan: each event row probes 10 ranges in memory,
    * no shuffle of the fact side.
    */
  def valueBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val bands = spark.range(0, 10).select(
      col("id").as("band"),
      (col("id") * 50.0).as("lo"),
      ((col("id") + 1) * 50.0).as("hi"))
    Tables.events(spark, dir)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("band")
  }

  /** Arithmetic variant of [[valueBandJoin]]: for UNIFORM bands the
    * join is unnecessary — `floor(value/width)` computes the band in
    * the scan projection, no join operator at all. This is the plan to
    * prefer whenever band edges are a closed-form function; the range
    * join above remains the general path for irregular band tables.
    */
  def valueBandArithmetic(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("value") >= 0.0 && col("value") < 500.0)
      .groupBy(floor(col("value") / 50.0).cast("bigint").as("band"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("band")

  /** Approximate distinct (HLL++): engine-specific sketch, so the raw
    * estimate has no DuckDB hash oracle. The checked surface is
    * [[hllErrorAudit]], which verifies the sketch against the exact
    * count. At 100 TB this replaces an exact countDistinct's full
    * shuffle of the key column with fixed-size sketch merges.
    */
  def approxDistinctParts(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).cast("bigint").as("approx_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** HLL++ accuracy audit — the KMV-audit move applied to the
    * engine-specific sketch: run [[approxDistinctParts]]'s estimate
    * NEXT TO the exact count in one pass and emit the exact values
    * plus the verified accuracy claim. The estimate itself is not
    * portable across engines (HLL register layouts differ), but the
    * GUARANTEE is: the sketch runs at Spark's default rsd = 5%, and
    * `within_2rsd` asserts the measured relative error is inside 2x
    * that (measured here: 2.4-2.7% across sf0.001-0.1) — a sketch
    * regression flips the boolean and fails the driver's hash gate,
    * so the sketch surface is fully oracle-checked with zero
    * rows-only entries.
    *
    * Scale shape: one hash aggregate; the HLL side merges fixed-size
    * sketches, the exact side pays the expand + (group, key) shuffle
    * — exactly the cost comparison the audit documents. At 100 TB the
    * audit runs on a sample or a few partitions; production serves
    * the sketch alone.
    */
  def hllErrorAudit(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey")).cast("bigint").as("approx_parts"),
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("n_parts"), col("n_rows"),
        (abs(col("approx_parts") - col("n_parts")).cast("double") / col("n_parts")
          <= 0.10).as("within_2rsd"))
      .orderBy("l_returnflag")

  /** Statistical aggregates: Pearson correlation, sample covariance,
    * and sample stddev of quantity vs extended price per return flag —
    * one hash-aggregate pass (Spark's imperative central-moment
    * aggregates), rounded to absorb engine-level summation-order
    * noise in the moment updates.
    */
  def priceQuantityStats(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_qty_price"),
        round(stddev_samp(col("l_quantity")), 6).as("stddev_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Correlated scalar subquery through the SQL layer: orders strictly
    * above their customer's average order price. Catalyst rewrites the
    * correlated aggregates into joins (SURVEY §4: subquery handling is
    * built-in). The comparison cross-multiplies exact decimals
    * (price·count > sum) instead of comparing against a floating
    * average, so borderline rows are engine-independent.
    */
  def aboveAverageOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders_v o
        |WHERE CAST(o_totalprice AS DECIMAL(18,6)) *
        |      (SELECT COUNT(*) FROM orders_v o2 WHERE o2.o_custkey = o.o_custkey) >
        |      (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,6)))
        |       FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Semi-structured VARIANT ingestion — the modern replacement for
    * per-access `get_json_object`: `parse_json` parses each props
    * string ONCE into the binary VARIANT encoding, and every
    * `variant_get` is a typed byte-offset read, not a re-parse. At
    * 100 TB this is the difference between one JSON parse per row and
    * one per (row × accessed field); the aggregate itself is the
    * ordinary partial-agg shuffle.
    */
  def variantPropsAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events_v")
    spark.sql(
      """SELECT event_type, COUNT(*) AS n_events,
        |  SUM(variant_get(v, '$.k', 'bigint')) AS sum_k,
        |  MAX(variant_get(v, '$.k', 'bigint')) AS max_k
        |FROM (SELECT event_type, parse_json(props) AS v FROM events_v)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Correlated LATERAL subquery (top-1 order per customer) — the
    * per-row-subquery surface. The interesting part is what Catalyst
    * does with it: the correlated LIMIT 1 DECORRELATES into a
    * rank-1 window with a map-side WindowGroupLimit (each input
    * partition keeps only its per-key best row BEFORE the shuffle)
    * joined back on the key — set-based, no per-customer execution,
    * no nested loop (plan-asserted). The third formulation of top-k
    * per group next to the window (x_topk_per_supplier) and the
    * bounded aggregator (x_topk_agg).
    */
  def lateralTopOrder(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        |FROM customer_v c, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders_v o
        |  WHERE o.o_custkey = c.c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
        |ORDER BY c.c_custkey""".stripMargin)
  }

  /** Error-safe arithmetic under ANSI mode — Spark 4 runs ANSI SQL by
    * default, where a division by zero or a bad cast THROWS and kills
    * the job; the `try_*` family returns NULL instead, which is the
    * only sane behavior when one malformed record out of 10^12 must
    * not abort a 100 TB pass. The query manufactures both failure
    * modes deterministically (an unparsable string for every k
    * divisible by 10, a zero divisor for every k divisible by 7) and
    * reports survival counts plus the sum over the successful rows —
    * the shape of every defensive-ingest quality report.
    */
  def safeArithmetic(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir).createOrReplaceTempView("events_v")
    spark.sql(
      """WITH e AS (
        |  SELECT event_type, value,
        |    CAST(get_json_object(props, '$.k') AS BIGINT) AS k
        |  FROM events_v),
        |m AS (
        |  SELECT event_type, value, k,
        |    CASE WHEN k % 10 = 0 THEN concat('v', k) ELSE CAST(k AS STRING) END AS k_raw
        |  FROM e)
        |SELECT event_type, COUNT(*) AS n_events,
        |  COUNT(try_cast(k_raw AS BIGINT)) AS n_parsable,
        |  COUNT(try_divide(value, k % 7)) AS n_divisible,
        |  ROUND(CAST(CAST(SUM(CAST(ROUND(try_divide(value, k % 7), 6)
        |    AS DECIMAL(18,6))) AS STRING) AS DOUBLE), 6) AS sum_ratio
        |FROM m GROUP BY event_type ORDER BY event_type""".stripMargin)
  }

  /** Recursive CTE hierarchy walk — each customer's management chain
    * up a deterministic 10-ary tree (parent = key DIV 10; the corpus
    * carries no hierarchy column, so the tree derives from the key —
    * the [[skewedJoinAgg]] precedent for shapes the testdata lacks).
    * Spark 4 recursion is UNION ALL-only: correct for DAGs/hierarchies
    * where each level strictly shrinks toward the root (depth here is
    * log10(maxKey), and each level is a narrow projection+filter over
    * the previous — no joins, no shuffle growth). For CYCLIC
    * fixpoints (the near-dup graph) UNION ALL would never terminate —
    * that is exactly why connected components stays the
    * driver-paced iterative operator ([[Dedup]] label propagation
    * with per-round checkpoints): engine recursion for hierarchies,
    * checkpointed iteration for cyclic graphs.
    */
  def managementChains(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    spark.sql(
      """WITH RECURSIVE chain(custkey, anc, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer_v
        |  UNION ALL
        |  SELECT custkey, anc DIV 10, depth + 1 FROM chain WHERE anc > 0)
        |SELECT custkey AS c_custkey, MAX(depth) AS depth,
        |       COUNT(*) AS n_chain, SUM(anc) AS anc_sum
        |FROM chain GROUP BY custkey ORDER BY c_custkey""".stripMargin)
  }

  /** UNION with set semantics (dedup across both sides). */
  def activeUsers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "view").select("user_id")
      .union(ev.filter(col("event_type") === "purchase").select("user_id"))
      .distinct()
      .orderBy("user_id")
  }

  /** Pivot (columns from values): order counts per priority, one
    * column per order status. Spark plans this as a single hash
    * aggregate with one pivot expression per (value, agg) pair — the
    * values list is explicit, as it must be at scale (value discovery
    * is an extra full pass).
    */
  def orderStatusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .na.fill(0L)
      .orderBy("o_orderpriority")

  /** Conditional aggregation (FILTER-clause semantics): per event
    * type, counts and sums restricted by predicates inside one
    * aggregate pass — no self-joins, no second scan.
    */
  def conditionalEventAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(
        count(when(col("value") > 250.0, 1)).as("n_high"),
        count(when(col("value") <= 250.0, 1)).as("n_low"),
        dsum(when(col("value") > 250.0, col("value"))).as("sum_high"),
        count(lit(1)).as("n_total"))
      .orderBy("event_type")

  /** Ranking/distribution window functions beyond row_number: quartile
    * (ntile), percent_rank, cume_dist, and frame first/last over each
    * customer's order history — one shuffle on the partition key, all
    * functions share the frame.
    */
  def orderRankStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    val frame = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w).cast("bigint"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("cheapest_order", first(col("o_orderkey")).over(frame))
      .withColumn("priciest_order", last(col("o_orderkey")).over(frame))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** String-function surface over the customer dimension: case, slice,
    * pad, replace, length — all codegen'd scalar projections, no
    * shuffle beyond the output ordering.
    */
  def customerNameFormats(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).cast("bigint").as("name_len"),
        regexp_replace(col("c_name"), "Customer", "Acct").as("name_repl"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_padded"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"))
      .orderBy("c_custkey")

  /** Schema-drift union: two event projections with DIFFERENT columns
    * merged by NAME with missing columns null-filled
    * (`unionByName(allowMissingColumns)`) — the ingestion reality of a
    * 100 TB corpus whose schema evolved across partitions/days. Zero
    * shuffle: the union concatenates partitions; nulls are projected,
    * not stored.
    */
  def schemaDriftUnion(spark: SparkSession, dir: String): DataFrame = {
    val views = Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("value"))
    val purchases = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
    views.unionByName(purchases, allowMissingColumns = true)
      .orderBy("event_id")
  }

  /** Date interval arithmetic: order-to-ship latency in days per
    * priority class (datediff over the big-big join, integer-exact
    * averages). The date functions run post-join in the codegen'd
    * projection; the join itself is the same sort-merge shape as
    * [[orderPriorityCount]].
    */
  def shipLatencyByPriority(spark: SparkSession, dir: String): DataFrame = {
    val dd = datediff(col("l_shipdate"), col("o_orderdate"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        (sum(dd.cast("bigint")).cast("double") / count(lit(1))).as("avg_days"),
        min(dd).cast("bigint").as("min_days"),
        max(dd).cast("bigint").as("max_days"),
        count(lit(1)).as("n_items"))
      .orderBy("o_orderpriority")
  }

  /** Boolean aggregate surface: bool_or / bool_and / count_if per
    * group — one hash-agg pass, no self-join (the set-membership
    * questions that otherwise tempt an EXISTS per predicate).
    */
  def eventBoolAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(expr("bool_or(value > 495.0)").as("any_extreme"),
           expr("bool_and(value >= 0.0)").as("all_nonneg"),
           expr("count_if(value > 250.0)").as("n_high"))
      .orderBy("event_type")

  /** Top-k per supplier via the typed bounded [[graft.functions.TopKAggregator]]
    * instead of the window rank: a single-pass hash aggregate holding
    * O(k) candidates per group with map-side partial merge, where the
    * window form sorts every row of each key. Same rows as
    * `topkPerSupplier` (same DuckDB oracle) — wired as its own bench
    * query so the two strategies are measured side by side.
    */
  def topkPerSupplierAgg(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    import graft.functions.TopKAggregator
    val agg = TopKAggregator.topKByPrice(k).toColumn
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("suppkey"), col("l_orderkey").as("orderkey"),
              col("l_linenumber").as("linenumber"), col("l_extendedprice").as("price"))
      .as[TopKAggregator.Item]
      .groupByKey(_.suppkey)
      .agg(agg.name("topk"))
      .flatMap { case (supp, items) =>
        items.zipWithIndex.map { case (it, i) =>
          (supp, it.orderkey, it.linenumber, it.price, (i + 1).toLong)
        }
      }
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rk")
      .orderBy("l_suppkey", "rk")
  }

  /** Unpivot (melt): the wide per-flag aggregate row turns into one
    * (flag, metric, value) row per measure — the inverse of pivot,
    * used to normalize wide exports back to long form. Spark's
    * `unpivot` expands map-side (an Expand, no shuffle beyond the
    * aggregate's own); the oracle mirrors with a literal UNION ALL.
    */
  def returnFlagUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(dsum(col("l_quantity")).as("sum_qty"),
           dsum(col("l_extendedprice")).as("sum_price"),
           count(lit(1)).cast("double").as("n_rows"))
      .unpivot(Array(col("l_returnflag")),
               Array(col("sum_qty"), col("sum_price"), col("n_rows")),
               "metric", "value")
      .orderBy("l_returnflag", "metric")

  /** Ratio-to-report window: each order's share of its customer's
    * total spend — an aggregate window (no frame) layered on the same
    * partitioning as the cumulative variant, ONE shuffle. Exact
    * decimal totals keep the denominator engine-identical; the ratio
    * rounds at 6.
    */
  def orderShareOfCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("cust_total",
        sum(col("o_totalprice").cast("decimal(18,6)")).over(w).cast("double"))
      .withColumn("share",
        round(col("o_totalprice").cast("decimal(18,6)").cast("double") / col("cust_total"), 6))
      .orderBy("o_orderkey")
  }

  /** CDC-style latest-row snapshot: the newest event per
    * (user_id, event_type), ties broken by event_id — the batch form
    * of compacting a changelog to current state. Window rank-1 keeps
    * the full row; at extreme group cardinality the same semantics can
    * run as a single hash-agg via max_by with a composite key (see
    * [[orderExtremesByStatus]]) instead of sorting each partition.
    */
  def latestSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ts_s").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
              unix_timestamp(col("ts")).as("ts_s"), col("value"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
      .orderBy("user_id", "event_type")
  }

  /** Event-time RANGE-frame sliding aggregate: per user, the count and
    * exact-decimal sum of values in the trailing hour of EVENT TIME
    * (not row count — ties and uneven spacing are handled by the frame
    * semantics, which makes the result order-independent and
    * oracle-exact). One shuffle on user_id; the batch analog of the
    * streaming sliding window.
    */
  def slidingHourValue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_s").rangeBetween(-3600, 0)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
              unix_timestamp(col("ts")).as("ts_s"), col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(col("value").cast("decimal(18,6)")).over(w).cast("double"))
      .orderBy("event_id")
  }

  /** min_by / max_by surface: cheapest and priciest order per status.
    * Determinism under price ties comes from a composite fixed-width
    * string key (zero-padded cents + orderkey) — both engines compare
    * it lexicographically == numerically, so the arg-extreme is unique
    * without a window sort. Single hash-agg pass, no join, no window —
    * the cheap form of "row that attains the extreme" at 100 TB.
    */
  def orderExtremesByStatus(spark: SparkSession, dir: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("bigint")
    val key = concat(lpad(cents.cast("string"), 18, "0"), lit("-"),
                     lpad(col("o_orderkey").cast("string"), 12, "0"))
    Tables.orders(spark, dir)
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"), key.as("k"))
      .groupBy("o_orderstatus")
      .agg(max_by(col("o_orderkey"), col("k")).as("priciest_order"),
           min_by(col("o_orderkey"), col("k")).as("cheapest_order"),
           max(col("o_totalprice")).as("max_price"),
           min(col("o_totalprice")).as("min_price"),
           count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")
  }

  /** Explicit GROUPING SETS (the general form behind rollup/cube):
    * per-flag totals, per-status totals, and the grand total in ONE
    * pass — Catalyst expands the sets map-side (an Expand node), so
    * the input scans once regardless of how many sets are requested.
    */
  def lineStatusGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  /** Regex extraction surface: pull the numeric `k` out of the raw
    * props JSON with a capture group (the untyped fallback when
    * payloads aren't clean enough for from_json); non-matches become
    * NULL via empty-string try_cast in both engines.
    */
  def propsRegexAgg(spark: SparkSession, dir: String): DataFrame = {
    val k = regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1).try_cast("bigint")
    Tables.events(spark, dir)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
           count(col("k")).as("n_matched"),
           sum(col("k")).as("sum_k"))
      .orderBy("event_type")
  }

  /** Sessionization via gaps-and-islands: a new session starts when
    * the same user's inter-event gap exceeds `gapSeconds`; the session
    * index is a running sum of the new-session flags. Two stacked
    * windows + one aggregation, all on the same user_id partitioning —
    * ONE shuffle total. This explicit form is also what streaming
    * `session_window` computes; here it is batch and oracle-checkable
    * (identical island SQL in DuckDB).
    */
  def sessionize(spark: SparkSession, dir: String, gapSeconds: Long = 1800): DataFrame =
    sessionizeEvents(
      Tables.events(spark, dir)
        .select(col("event_id"), col("user_id"),
                unix_timestamp(col("ts")).as("ts_s"), col("value")),
      gapSeconds)
      .orderBy("user_id", "session_idx")

  /** Gaps-and-islands core over (event_id, user_id, ts_s, value) rows —
    * shared by the oracle query above and the stream==batch assertion
    * for the streaming `session_window` twin
    * ([[graft.streaming.StreamingSma.sessionCounts]]).
    */
  def sessionizeEvents(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    val running = byUser.rowsBetween(Window.unboundedPreceding, 0)
    events
      .withColumn("new_session",
        when(col("ts_s") - lag(col("ts_s"), 1).over(byUser) > gapSeconds, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx", sum(col("new_session")).over(running))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_s")).as("session_start_s"),
        max(col("ts_s")).as("session_end_s"),
        dsum(col("value")).as("sum_value"))
  }

  /** Left-outer star join: every customer (kept even with zero
    * orders) enriched through the nation→region dimension chain —
    * both dims broadcast — with order counts/spend from a left join.
    * COUNT(column) counts matched rows only, so customers without
    * orders report 0, and the decimal sum coalesces to 0.
    */
  def customerOrderSummary(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("n_name"), col("r_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(col("o_totalprice").cast("decimal(18,6)")), lit(0).cast("decimal(18,6)"))
          .cast("double").as("total_spend"))
      .orderBy("c_custkey")
  }

  /** INTERSECT (set semantics, dedup both sides): users who both
    * viewed and clicked. Planned as a left-semi join over distinct
    * keys — one shuffle per side on the join key.
    */
  def usersViewAndClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "view").select("user_id")
      .intersect(ev.filter(col("event_type") === "click").select("user_id"))
      .orderBy("user_id")
  }

  /** EXCEPT: users who viewed but never purchased — anti-join over
    * distinct keys. */
  def usersViewNoPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    ev.filter(col("event_type") === "view").select("user_id")
      .except(ev.filter(col("event_type") === "purchase").select("user_id"))
      .orderBy("user_id")
  }

  /** lead/lag navigation window: each event with its same-user
    * predecessor and successor values and the step delta. One shuffle
    * on the partition key; double subtraction is exact and
    * deterministic (no rounding needed).
    */
  def eventValueSteps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .withColumn("delta", col("value") - col("prev_value"))
      .orderBy("event_id")
  }

  /** Exact percentiles (linear interpolation) of quantity per return
    * flag. At 100 TB exact percentiles sort each group — prefer
    * approx_percentile (t-digest sketch) there; this is the exact
    * twin, same pairing as distinct/approx-distinct.
    */
  def quantityPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 6).as("p25"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_quantity, 0.75)"), 6).as("p75"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Calendar arithmetic: orders rolled up to (year, month) with
    * day-of-month extremes — date_trunc/extract stay in the scan
    * projection, so partition pruning by month composes for free on a
    * date-partitioned table.
    */
  def ordersByMonth(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        year(col("o_orderdate")).cast("bigint").as("o_year"),
        month(col("o_orderdate")).cast("bigint").as("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("sum_price"),
        max(dayofmonth(col("o_orderdate"))).cast("bigint").as("max_day"))
      .orderBy("o_year", "o_month")

  /** Skew-safe two-phase (salted) aggregation: phase 1 aggregates on
    * (key, salt) so a hot key spreads over 16 reducers, phase 2 merges
    * the partials. Results are identical to the direct aggregation
    * (the oracle IS the direct form) — decimal partials make the
    * two-step sum exact. This is the standard rescue when AQE skew
    * handling isn't available (aggregation skew, not join skew).
    */
  def saltedEventAgg(spark: SparkSession, dir: String, buckets: Int = 16): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), pmod(xxhash64(col("event_id")), lit(buckets)).as("salt"))
      .agg(count(lit(1)).as("pc"),
           sum(col("value").cast("decimal(18,6)")).as("ps"))
      .groupBy("event_type")
      .agg(sum(col("pc")).as("n_events"),
           sum(col("ps")).cast("double").as("sum_value"))
      .orderBy("event_type")

  /** Join-side skew rescue: a fact table whose join key is 90% ONE hot
    * value (the realistic 100 TB failure axis — a null-ish default,
    * one viral entity) joined to a uniform dim too large to broadcast
    * in the demo conf. The QUERY is declarative and conf-independent —
    * the rescue is AQE's OptimizeSkewedJoin splitting the hot
    * post-shuffle partition at runtime (PlanSpec asserts the split
    * under skew-sensitive thresholds; results are identical either
    * way, which is exactly the point: no salting rewrite, no manual
    * key surgery — the complement of [[saltedEventAgg]], which covers
    * AGGREGATION skew where AQE has no rescue).
    *
    * The rollup key (`w`) deliberately differs from the join key
    * (`k`): a downstream agg ON the join key could consume the join's
    * partitioning, and AQE reverts a skew split that would introduce
    * an extra shuffle — aggregating on a non-join key keeps the agg
    * exchange in both plans, the shape where the rescue fires.
    * Synthetic `range` inputs rather than the parquet tables: the
    * demo needs a deterministic, oracle-expressible 9:1 hot key at a
    * size the testdata corpus doesn't exhibit.
    */
  def skewedJoinAgg(spark: SparkSession, dir: String,
                    nFact: Long = 200000L, nDim: Long = 2000L): DataFrame = {
    val fact = spark.range(nFact).select(
      when(pmod(col("id"), lit(10L)) =!= 0, lit(7L))
        .otherwise(pmod(col("id"), lit(nDim))).as("k"),
      pmod(col("id"), lit(97L)).as("v"))
    val dim = spark.range(nDim).select(col("id").as("k"),
      pmod(col("id"), lit(13L)).as("w"))
    fact.join(dim, Seq("k"))
      .groupBy("w")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      .orderBy("w")
  }

  /** Approximate percentiles (quantile-summary sketch) — the 100 TB
    * default, paired with [[quantityPercentiles]] exactly like
    * approx/exact distinct. The raw estimate is engine-specific; the
    * checked surface is [[tdigestErrorAudit]].
    */
  def approxQuantityPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, 0.5)").as("p50_approx"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Quantile-sketch accuracy audit — verify the GUARANTEE, not the
    * instance: `approx_percentile` promises its answer's exact rank
    * is within eps*N of the target rank (eps = 1/accuracy, default
    * 1/10000), a bound that holds for ANY merge order, so the audit
    * boolean is deterministic even though the sketch's internal state
    * is not. Phase 1 computes the per-group sketch answer next to the
    * exact interpolated p50; phase 2 measures the answer's exact rank
    * interval [rank_lo+1, rank_hi] (strict-less / less-or-equal
    * counts — ties widen it, as they should) with one broadcast join
    * of the groups-sized answer table back over the fact, and
    * `within_rank_eps` asserts the interval touches
    * [0.5N - epsN - 1, 0.5N + epsN + 1]. Output carries the exact
    * p50 (oracle-computed) and the verified claim — the second of the
    * two sketch surfaces, leaving zero rows-only entries.
    */
  def tdigestErrorAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select("l_returnflag", "l_quantity")
    val sk = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_quantity, 0.5)").as("p50a"),
           round(expr("percentile(l_quantity, 0.5)"), 6).as("p50_exact"),
           count(lit(1)).as("n_rows"))
    val eps = 1.0 / 10000 // approx_percentile's default rank accuracy
    val ranks = li
      .join(broadcast(sk.select("l_returnflag", "p50a")), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(sum(when(col("l_quantity") < col("p50a"), 1L).otherwise(0L)).as("rank_lo"),
           sum(when(col("l_quantity") <= col("p50a"), 1L).otherwise(0L)).as("rank_hi"))
    sk.join(ranks, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_rows"), col("p50_exact"),
        (col("rank_lo") <= col("n_rows") * 0.5 + col("n_rows") * eps + 1 &&
         col("rank_hi") >= col("n_rows") * 0.5 - col("n_rows") * eps - 1)
          .as("within_rank_eps"))
      .orderBy("l_returnflag")
  }

  /** Exact-distinct twin of [[approxDistinctParts]], with a DuckDB
    * oracle — pins down the semantics the sketch approximates. Exact
    * distinct costs an expand + second shuffle on (group, key); the
    * approx variant above is the 100 TB default.
    */
  def distinctPartsExact(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")

  /** Batch interval join — every (view, purchase) pair of the same
    * user with the purchase inside the hour after the view (the
    * attribution-window join; the batch twin of the streaming
    * interval join in `streaming/StreamJoins.scala`). Shape: an
    * equi-join on the user key carries the shuffle, the time window
    * is a residual range predicate evaluated inside the join — never
    * a cross product; at 100 TB both sides also partition by coarse
    * time bucket so a key's history never colocates unbounded.
    */
  def viewToPurchaseWithinHour(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    views.join(purchases, Seq("user_id"))
      .filter(col("purchase_ts") >= col("view_ts") &&
              col("purchase_ts") < col("view_ts") + expr("interval 1 hour"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
           countDistinct(col("view_id")).as("n_attributed_views"),
           countDistinct(col("purchase_id")).as("n_attributed_purchases"))
      .orderBy("user_id")
  }

  /** Z-score outlier audit per event type: values beyond mean ± 3σ.
    * The mean and stddev ROUND to 6 decimals before the comparison
    * (the [[winsorizedQuantity]] bound trick): engines compute
    * stddev with different summation algorithms, so comparing against
    * the raw double would flip boundary rows — against the rounded
    * bound both sides classify identically. Two-pass like every
    * group-statistic filter: tiny per-group moments broadcast back
    * over the fact table.
    */
  def zscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(round((dsum(col("value")) / count(lit(1))), 6).as("mean_v"),
           round(stddev_samp(col("value")), 6).as("std_v"))
    Tables.events(spark, dir)
      .join(broadcast(stats), Seq("event_type"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           min(col("mean_v")).as("mean_v"),
           min(col("std_v")).as("std_v"),
           // coalesce: a single-row group has NULL stddev, making every
           // comparison NULL and the sum NULL — the count must read 0
           coalesce(sum((col("value") > col("mean_v") + lit(3.0) * col("std_v"))
             .cast("bigint")), lit(0L)).as("n_high_outliers"),
           coalesce(sum((col("value") < col("mean_v") - lit(3.0) * col("std_v"))
             .cast("bigint")), lit(0L)).as("n_low_outliers"))
      .orderBy("event_type")
  }

  /** Last-observation-carried-forward over the densified hour spine:
    * [[hourlyGapFill]] provides the zeros; this fills each empty
    * hour's AVERAGE VALUE with the most recent observed hour's (the
    * standard telemetry/feature-store fill). `last_value(...,
    * ignoreNulls)` over an unbounded-preceding frame is the
    * one-window LOCF — no self-join, one shuffle on the series key.
    */
  def hourlyValueLocf(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val hourly = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(round(dsum(col("value")) / count(lit(1)), 6).as("avg_value"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    densifyByHour(ev, hourly)
      .withColumn("filled_value",
        last(col("avg_value"), ignoreNulls = true).over(w))
      .withColumn("is_filled", col("avg_value").isNull)
      .select("event_type", "hour", "filled_value", "is_filled")
      .orderBy("event_type", "hour")
  }

  /** (type × hour) spine left-joined onto a per-(type, hour) aggregate
    * — ONE definition of the densification scaffold shared by
    * [[hourlyGapFill]] and [[hourlyValueLocf]] so a spine fix (bounds,
    * timezone) can never apply to one and not the other.
    */
  private def densifyByHour(ev: DataFrame, hourlyAgg: DataFrame): DataFrame = {
    val hours = ev
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
           date_trunc("hour", max(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
    ev.select("event_type").distinct()
      .crossJoin(hours)
      .join(hourlyAgg, Seq("event_type", "hour"), "left_outer")
  }

  /** Fixed-width value histogram per event type — the distribution
    * profile a monitoring/data-quality pass computes. Bins are
    * integer arithmetic on exact cents (floor-divide cents by 2000 =
    * 20.00-wide buckets), so bucket boundaries are engine-independent
    * — a `floor(value/20)` on doubles would flip boundary cents by
    * one ulp, and plain `div` (truncate-toward-zero) would disagree
    * with floor-division engines (DuckDB `//`) on negative values. One hash aggregate; bin count is bounded by the value
    * range, so the output stays tiny at any corpus size.
    */
  /** Floor binning of `value` into $20 (2000-cent) bins, division-
    * semantics-free: cents minus pmod(cents, 2000) is an EXACT
    * multiple of 2000, so the `div` is exact division — identical
    * under floor (DuckDB `//`) or truncate (Spark `div`) semantics
    * for any sign of value. The oracle uses the same subtraction
    * form; negative-value floor semantics are probed in
    * PipelineOpsSpec so neither side silently leans on a
    * non-negative-corpus contract.
    */
  private[graft] val histogramBin =
    expr("(CAST(round(value * 100) AS BIGINT) - " +
      "pmod(CAST(round(value * 100) AS BIGINT), 2000)) div 2000")

  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), histogramBin.as("bin"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("bin_lo", (col("bin") * 20.0))
      .select("event_type", "bin", "bin_lo", "n_events")
      .orderBy("event_type", "bin")

  /** Hopping (sliding-bucket) window aggregation in batch: each event
    * lands in window/slide = 4 overlapping one-hour buckets stepped
    * every 15 minutes — the smoothed time-series view dashboards
    * build, and the exact batch twin of the streaming
    * `window(ts, "1 hour", "15 minutes")` aggregation. Spark plans
    * the bucket fan-out as an Expand (map-side row replication, like
    * rollup), so the shuffle carries 4× pre-aggregated partials, not
    * 4× events.
    */
  def hoppingEventCounts(spark: SparkSession, dir: String): DataFrame =
    hoppingAgg(Tables.events(spark, dir))
      .orderBy("win_start", "event_type")

  /** The hopping aggregation itself over any (ts, event_type, value)
    * frame — ONE definition of the window spec (1 h / 15 min) and the
    * decimal-exact sum, shared by the batch query above and the
    * stream==batch parity test so the "streaming twin" claim is
    * checked against THIS code, not a copy.
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           round(dsum(col("value")), 6).as("sum_value"))
      .select(col("window.start").as("win_start"), col("window.end").as("win_end"),
              col("event_type"), col("n_events"), col("sum_value"))

  /** Calendar gap-filling (time-series densification): hourly event
    * counts per type INCLUDING empty hours — the spine join every
    * dashboard/forecasting feed needs, and a correctness trap when
    * absent (a missing hour reads as "no data" instead of zero). The
    * hour spine generates from the observed min/max (a sequence
    * explode over one row), cross-joins the distinct type list, and
    * left-joins the pre-aggregated counts: the fact table reduces
    * BEFORE any join, so the spine join handles #types × #hours rows
    * regardless of corpus size.
    */
  def hourlyGapFill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val counts = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    densifyByHour(ev, counts)
      .select(col("event_type"), col("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("event_type", "hour")
  }

  /** NOT IN with a nullable subquery — the null-aware anti join.
    * `NOT IN` is three-valued: one NULL in the subquery empties the
    * result, so the planner cannot use a plain anti join unless it
    * can PROVE the subquery column non-null; here it cannot (parquet
    * nullability), and Catalyst plans the null-aware single-column
    * variant as a broadcast hash join with `isNullAware=true` instead
    * of the quadratic BroadcastNestedLoop it falls back to otherwise.
    * Semantically: customers whose key never appears among high-value
    * order custkeys.
    */
  def customersNoBigOrders(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    Tables.orders(spark, dir).createOrReplaceTempView("orders_v")
    spark.sql(
      """SELECT c_custkey, c_name FROM customer_v
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders_v WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Type-2 slowly-changing-dimension build — the WRITE side of the
    * CDC pair whose read side is [[latestSnapshot]]: fold a change
    * stream into versioned validity intervals (valid_from/valid_to,
    * half-open; the open interval is the current row). One lead()
    * window per key — a single shuffle on the dimension key; at
    * 100 TB the incremental variant merges only the changed keys'
    * tail rows, but the interval semantics are exactly these.
    */
  def scd2UserValue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("version", row_number().over(w).cast("bigint"))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select("user_id", "version", "event_id", "valid_from", "valid_to",
              "is_current", "value")
      .orderBy("user_id", "version")
  }

  /** Bag-semantics set difference (EXCEPT ALL): each purchase
    * occurrence cancels against one view occurrence per user; the
    * surviving multiplicity is max(0, purchases - views). Completes
    * the §2.6 set-operation family (the DISTINCT forms are
    * x_except / x_intersect). Spark plans except-all as a count-diff
    * aggregate + row replication — one shuffle, no join explosion.
    */
  def purchaseSurplus(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def ids(t: String) = ev.filter(col("event_type") === t).select("user_id")
    ids("purchase").exceptAll(ids("view"))
      .groupBy("user_id").agg(count(lit(1)).as("n_surplus"))
      .orderBy("user_id")
  }

  /** Bag-semantics intersection (INTERSECT ALL): per user, the
    * multiplicity both event multisets share — min(purchases, views).
    * The twin of [[purchaseSurplus]].
    */
  def purchaseViewOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def ids(t: String) = ev.filter(col("event_type") === t).select("user_id")
    ids("purchase").intersectAll(ids("view"))
      .groupBy("user_id").agg(count(lit(1)).as("n_common"))
      .orderBy("user_id")
  }

  /** Selective-dimension fact join — the shape Spark's runtime BLOOM
    * FILTER injection (InjectRuntimeFilter) exists for: a 0.7%-
    * selective predicate on the dimension side, a fact side that
    * shuffles for the join. When the dim is too large to broadcast
    * (the 100 TB case — both sides shuffle), the optimizer builds a
    * bloom filter from the filtered dim keys and applies
    * `might_contain(l_partkey)` on the fact side BEFORE its shuffle,
    * so ~99% of fact rows drop pre-exchange instead of after the
    * join — the runtime analog of the static partition pruning the
    * other join queries rely on. PlanSpec asserts the injection under
    * forced-shuffle-join, scale-adjusted thresholds; at this demo
    * scale the dim broadcasts and the filter is unnecessary, which is
    * itself the correct plan.
    */
  def runtimeFilteredRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir)
              .filter(col("p_brand") === "Brand#7" && col("p_size") <= 5),
            col("l_partkey") === col("p_partkey"))
      .groupBy("p_size")
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_extendedprice").cast("decimal(18,6)") *
               (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
             .cast("double").as("revenue"))
      .orderBy("p_size")

  /** Winsorization — percentile-clamp outlier treatment, the robust-
    * statistics cousin of the quality gate: per group, values below
    * p05 / above p95 are pulled to the bound, and the rollup reports
    * how many rows were clamped on each side plus the raw vs
    * winsorized means. Two-pass by nature: an exact-percentile pass
    * over each group, then the bounds re-attach by broadcast for the
    * clamp pass — at 100 TB pass one switches to approx_percentile
    * (the sketch twin, same pairing as x_percentiles /
    * x_approx_percentiles) and pass two is unchanged.
    *
    * Bounds round to 6 decimals BEFORE the clamp so both engines
    * compare against the identical double; clamped values go through
    * DECIMAL for the order-independent exact mean.
    */
  def winsorizedQuantity(spark: SparkSession, dir: String): DataFrame = {
    val bounds = Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(round(expr("percentile(l_quantity, 0.05)"), 6).as("p05"),
           round(expr("percentile(l_quantity, 0.95)"), 6).as("p95"))
    val wq = least(greatest(col("l_quantity"), col("p05")), col("p95"))
    Tables.lineitem(spark, dir)
      .join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
           min(col("p05")).as("p05"),
           min(col("p95")).as("p95"),
           sum((col("l_quantity") < col("p05")).cast("bigint")).as("n_lo_clamped"),
           sum((col("l_quantity") > col("p95")).cast("bigint")).as("n_hi_clamped"),
           round(dsum(col("l_quantity")) / count(lit(1)), 6).as("avg_raw"),
           round(dsum(wq) / count(lit(1)), 6).as("avg_winsorized"))
      .orderBy("l_returnflag")
  }

  /** Full-outer reconciliation: per-user view counts vs purchase
    * counts merged so users present on either side survive, with a
    * funnel classification. The missing join type in the §2.4 surface
    * (inner/semi/anti/left-outer are covered elsewhere) and the shape
    * of every two-system reconciliation report.
    *
    * Scale shape: both inputs reduce to one row per user BEFORE the
    * join, and the join key equals both aggregation keys — the
    * aggregates' hash partitioning is reused, so the full-outer
    * sort-merge adds NO third exchange (plan-asserted). Full-outer
    * cannot broadcast by definition (either side may contribute
    * unmatched rows), which is why partitioning reuse is the lever
    * that matters at 100 TB.
    */
  def userFunnelReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def perUser(eventType: String, as: String): DataFrame = ev
      .filter(col("event_type") === eventType)
      .groupBy("user_id")
      .agg(count(lit(1)).as(as))
    perUser("view", "n_views")
      .join(perUser("purchase", "n_purchases"), Seq("user_id"), "full_outer")
      .select(
        col("user_id"),
        coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("n_purchases"), lit(0L)).as("n_purchases"),
        when(col("n_views").isNotNull && col("n_purchases").isNotNull, lit("converted"))
          .when(col("n_views").isNotNull, lit("browsed_only"))
          .otherwise(lit("purchased_direct")).as("funnel_state"))
      .orderBy("user_id")
  }

  /** Bit-interleave expression for a z-value over two pre-normalized
    * 10-bit coordinates. ONE generator emits both SQL dialects so the
    * curve definition cannot drift between the Spark operator and the
    * DuckDB oracle (the pqTrainCtes discipline applied to layout).
    */
  private[graft] def zInterleave(p: String, s: String, bits: Int,
                                 sparkSql: Boolean): String =
    (0 until bits).flatMap { i =>
      if (sparkSql) Seq(
        s"shiftleft(shiftright($p, $i) & 1, ${2 * i})",
        s"shiftleft(shiftright($s, $i) & 1, ${2 * i + 1})")
      else Seq(
        s"((($p >> $i) & 1) << ${2 * i})",
        s"((($s >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")

  /** Z-order data-skipping audit — the LAYOUT lever at 100 TB: what a
    * scan reads is decided by file-level min/max statistics, and those
    * are decided by how the table was sorted when written. For one
    * two-dimensional box predicate (the middle quarter of each key
    * domain: `l_partkey` AND `l_suppkey` each in [max/4, max/2)), the
    * audit writes the table three ways and reports what a
    * stats-pruned scan would read under each:
    *   - `natural`: insertion order — no dimension clusters, every
    *     shard straddles the box, the scan reads everything;
    *   - `bypart`: single-dimension sort — prunes to the partkey
    *     range (~1/4 of shards) but every surviving shard spans all
    *     suppkeys;
    *   - `zorder`: bit-interleaved curve over BOTH dimensions,
    *     domain-normalized to a 10-bit grid first (the equi-width
    *     analog of what a table optimizer's multi-column clustering
    *     does; un-normalized interleave would let the wider dimension
    *     dominate the curve) — shards approximate rectangles, so the
    *     box touches ~area-fraction of them.
    * Measured on this corpus: natural 64/64 shards, bypart 17,
    * zorder 8-9 — the two-dimensional layout reads ~2x less than the
    * single-dimension sort and ~7x less than insertion order, for the
    * same query and the same data.
    *
    * Exactness: shard boundaries are integer rank arithmetic
    * (`(rn-1)*S div N`) over a unique (sortkey, l_orderkey,
    * l_linenumber) total order; the z-value is pure integer bit
    * arithmetic; min/max/count per shard and the prune predicate are
    * integer comparisons — engine-exact throughout.
    *
    * Scale shape: each layout is one [[CorpusOps.withGlobalRank]]
    * pass (range partition + per-partition rank + offsets — the
    * scalable distributed ROW_NUMBER, no single-reducer window), a
    * 64-group aggregate, and a 64-row prune — auditing three layouts
    * costs three table passes by construction (a production optimizer
    * writes ONE layout; the audit is the evidence for choosing it).
    * The domain maxima are a 1-row aggregate collected once (bounded
    * driver collect, like withGlobalRank's partition counts).
    */
  def zorderSkipping(spark: SparkSession, dir: String,
                     nShards: Int = 64): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    val mxRow = base
      .agg(max(col("l_partkey").cast("bigint")).as("xp"),
        max(col("l_suppkey").cast("bigint")).as("xs"))
      .collect()(0)
    val (xp, xs) = (mxRow.getLong(0), mxRow.getLong(1))
    val (plo, phi) = ((xp + 1) / 4, (xp + 1) / 2 - 1)
    val (slo, shi) = ((xs + 1) / 4, (xs + 1) / 2 - 1)
    val lz = base
      .withColumn("np", expr(s"CAST(l_partkey AS BIGINT) * 1024 div ${xp + 1}L"))
      .withColumn("ns", expr(s"CAST(l_suppkey AS BIGINT) * 1024 div ${xs + 1}L"))
      .withColumn("zval", expr(zInterleave("np", "ns", 10, sparkSql = true)))
    def audit(name: String, sortCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val (ranked, total) = CorpusOps.withGlobalRank(lz, sortCols, "rn")
      val st = ranked
        .withColumn("shard", expr(s"(rn - 1) * $nShards div ${total}L"))
        .groupBy("shard")
        .agg(min("l_partkey").as("mp"), max("l_partkey").as("xp2"),
          min("l_suppkey").as("ms"), max("l_suppkey").as("xs2"),
          count(lit(1)).as("c"))
      val pruned = col("xp2") < plo || col("mp") > phi ||
        col("xs2") < slo || col("ms") > shi
      st.agg(count(lit(1)).as("n_shards"),
          sum(when(pruned, 0L).otherwise(1L)).as("shards_read"),
          sum(when(pruned, 0L).otherwise(col("c"))).as("rows_scanned"))
        .select(lit(name).as("layout"), col("n_shards"), col("shards_read"),
          col("rows_scanned"),
          round(col("rows_scanned").cast("double") / total, 6).as("read_frac"))
    }
    audit("natural", Seq(col("l_orderkey"), col("l_linenumber")))
      .unionByName(audit("bypart",
        Seq(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))))
      .unionByName(audit("zorder",
        Seq(col("zval"), col("l_orderkey"), col("l_linenumber"))))
      .orderBy("layout")
  }

  /** Cohort retention matrix over the event stream — the classic
    * product-analytics rollup: users cohorted by FIRST-seen day, each
    * cohort's distinct active users counted at every day offset, and
    * the share retained. Day buckets ride the [[hourlyEventAgg]] epoch
    * convention (session-zoned truncation cast to epoch seconds) so
    * both engines compare integers, never timestamps.
    *
    * Scale shape: the (user, day) activity grid is ONE distinct over a
    * narrow projection (the only corpus-sized shuffle); first-seen and
    * cohort sizes are user-count-sized rollups of it; the retention
    * cell count is bounded by days² regardless of event volume.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    retentionFrom(Tables.events(spark, dir)
      .select(col("user_id"),
        date_trunc("day", col("ts")).cast("long").as("day_s"))
      .distinct()
      .localCheckpoint()) // consumers: first-seen rollup + the cell join

  /** [[cohortRetention]] over ANY already-distinct `(user_id, day_s)`
    * activity grid — THE shared seam with the streaming twin
    * ([[graft.streaming.StreamingRetention]]), so stream-served and
    * batch matrices cannot drift. Callers materialize the grid (two
    * consumers).
    */
  private[graft] def retentionFrom(grid: DataFrame): DataFrame = {
    val firstDay = grid.groupBy("user_id").agg(min(col("day_s")).as("cohort_s"))
    val sizes = firstDay.groupBy("cohort_s")
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    grid.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_s"),
        ((col("day_s") - col("cohort_s")) / 86400).cast("bigint").as("offset_days"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .join(sizes, Seq("cohort_s"))
      .select(col("cohort_s"), col("offset_days"), col("n_users"), col("cohort_size"),
        round(col("n_users").cast("double") / col("cohort_size"), 6).as("retention"))
      .orderBy("cohort_s", "offset_days")
  }

  /** TPC-H Q5-class regional revenue: the six-table star join
    * (region→nation gating both ends of the customer/supplier pair,
    * the LOCAL-supply condition c_nationkey = s_nationkey that makes
    * Q5 a join-order benchmark) with a one-year order window, revenue
    * per nation. The money discipline is [[topRevenueOrders]]'s
    * (DECIMAL-exact sums, double at the boundary).
    *
    * Scale shape: lineitem never shuffles for the dimensions —
    * region/nation broadcast (5/25 rows), customer and supplier
    * shuffle on their keys once, the date filter prunes orders before
    * its join, and the final aggregate is nations-sized. Join order
    * is Catalyst's to pick: every predicate is declarative, so the
    * optimizer (with AQE) reorders as stats dictate — the reason to
    * express Q5 relationally instead of hand-pipelining it.
    */
  def regionalRevenue(spark: SparkSession, dir: String,
                      region: String = "ASIA"): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === region)
    val nat = Tables.nation(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
    Tables.lineitem(spark, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)") *
               (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
             .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Event-type transition matrix: the first-order Markov estimate of
    * user behavior — for each (from, to) pair of consecutive events in
    * a user's (ts, id) tick order, the transition count and row
    * probability. The lag window partitions by user; the probability
    * normalization is a window over the BOUNDED from-type-sized cell
    * table. Probabilities divide exact integer counts.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_timestamp(col("ts")).asc, col("event_id").asc)
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val wf = Window.partitionBy("from_type")
    pairs
      .withColumn("p",
        round(col("n_transitions") / sum(col("n_transitions")).over(wf), 6))
      .select("from_type", "to_type", "n_transitions", "p")
      .orderBy("from_type", "to_type")
  }

  /** Repeat-purchase intervals: days between consecutive orders of the
    * same customer (lag over the (date, orderkey) total order), rolled
    * up per market segment — the inter-arrival analysis behind churn
    * and reorder-cadence models. Exact integer day gaps; the lag
    * window partitions by customer and the rollup is segment-sized.
    */
  def reorderIntervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select("o_custkey", "o_orderdate", "o_orderkey")
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev_date").isNotNull)
      .withColumn("gap_days",
        datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))).cast("bigint"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_gaps"),
           min(col("gap_days")).as("min_gap"),
           max(col("gap_days")).as("max_gap"),
           round(sum(col("gap_days")) / count(lit(1)), 6).as("mean_gap"),
           round(expr("percentile(gap_days, 0.5)"), 6).as("p50_gap"))
      .orderBy("c_mktsegment")
  }

  /** Skyline (Pareto frontier) of customers over (order count, exact
    * cent spend): a customer is dominated when another is >= on both
    * axes and strictly better on one. The 2-D skyline reduces to a
    * per-frequency max-spend table (bounded by the distinct frequency
    * count) with a prefix-max over strictly-higher frequencies — so
    * the only window runs over that BOUNDED table, never the customer
    * set, and the frontier membership test is one broadcast join back.
    * The oracle deliberately uses the independent NOT EXISTS dominance
    * formulation, so the reduction itself is what's being checked.
    * All-integer axes: no float boundary anywhere. Headroom: spend is
    * a PER-CUSTOMER cent sum (never corpus-sized), so LongType holds
    * to ~9e16 dollars per single customer — not a practical ceiling.
    */
  def customerSkyline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fm = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("freq"),
           sum(round(col("o_totalprice") * 100).cast("bigint")).as("spend_cents"))
    val fmax = fm.groupBy("freq").agg(max(col("spend_cents")).as("mx"))
    // bounded: one row per distinct order count
    val wf = Window.orderBy(col("freq").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pref = fmax.withColumn("hi", max(col("mx")).over(wf))
    fm.join(broadcast(pref), "freq")
      .filter(col("spend_cents") === col("mx") &&
              (col("hi").isNull || col("spend_cents") > col("hi")))
      .select("o_custkey", "freq", "spend_cents")
      .orderBy("o_custkey")
  }

  /** Shipping-delay distribution per order priority: the fulfilment
    * SLA audit (days between order placement and line shipment).
    * Delays are exact integer day counts, so min/max/mean are integer
    * arithmetic with one double division; the median is the exact
    * interpolated percentile (t-digest at 100 TB, as everywhere).
    * One big-big equi-join on orderkey, then a priority-sized rollup.
    */
  def shipDelay(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).cast("bigint"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
           min(col("delay_days")).as("min_delay"),
           max(col("delay_days")).as("max_delay"),
           round(sum(col("delay_days")) / count(lit(1)), 6).as("mean_delay"),
           round(expr("percentile(delay_days, 0.5)"), 6).as("p50_delay"))
      .orderBy("o_orderpriority")

  /** Funnel step timing: [[eventFunnel]] counts who converts; this
    * measures HOW LONG each conversion step takes (median and mean
    * seconds between step completions). Epoch-second lags are exact
    * integers; the same windowed step derivation as the funnel, so the
    * two views reconcile.
    */
  def funnelTiming(spark: SparkSession, dir: String,
                   windowHours: Int = 24): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val w = expr(s"INTERVAL $windowHours HOURS")
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, Seq("user_id"))
      .filter(col("ts") >= col("t1") && col("ts") <= col("t1") + w)
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id"))
      .filter(col("ts") >= col("t2") && col("ts") <= col("t2") + w)
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    def lagOf(df: DataFrame, from: String, to: String, name: String) =
      df.select((unix_timestamp(col(to)) - unix_timestamp(col(from))).as("lag_s"))
        .agg(count(lit(1)).as("n_users"),
             round(sum(col("lag_s")) / count(lit(1)), 6).as("mean_lag_s"),
             round(expr("percentile(lag_s, 0.5)"), 6).as("p50_lag_s"))
        .select(lit(name).as("step"), col("n_users"), col("mean_lag_s"), col("p50_lag_s"))
    lagOf(t1.join(t2, "user_id"), "t1", "t2", "signup_to_click")
      .unionByName(lagOf(t2.join(t3, "user_id"), "t2", "t3", "click_to_purchase"))
      .orderBy("step")
  }

  /** Per-segment Gini concentration of customer spend — the
    * inequality audit (is revenue concentrated in a few whales?).
    * Spend is exact integer CENTS; the Lorenz rank comes from ONE
    * [[CorpusOps.withGlobalRank]] pass over (segment, cents, custkey)
    * with per-segment rank recovered as grn - min(grn in segment) + 1
    * (the segment-sized min table broadcasts back) — so no per-segment
    * single-reducer window ever materializes, unlike the naive
    * `ROW_NUMBER() OVER (PARTITION BY segment ...)` whose hot segment
    * is one reducer at 100 TB. Gini is the all-integer rank form
    * G = (2·Σ(rn·cents) - (n+1)·Σcents) / (n·Σcents): one double
    * division of exact integers, engine-identical. Σ(rn·cents)
    * accumulates as decimal(38,0) — matching DuckDB's silent
    * SUM→HUGEINT promotion — so the form stays exact (no Long
    * overflow, no ANSI failure) to ~1e9 customers per segment at
    * whale-scale cent totals.
    */
  def giniSpend(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select("o_custkey", "c_mktsegment", "cents")
    val (ranked, _) = CorpusOps.withGlobalRank(spend,
      Seq(col("c_mktsegment"), col("cents"), col("o_custkey")), "grn")
    val segStart = ranked.groupBy(col("c_mktsegment").as("seg"))
      .agg(min(col("grn")).as("rn0"))
    ranked
      .join(broadcast(segStart), col("c_mktsegment") === col("seg"))
      .withColumn("rn", col("grn") - col("rn0") + 1)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           sum(col("cents")).as("total_cents"),
           sum((col("rn").cast("decimal(19,0)") *
                col("cents").cast("decimal(19,0)")).cast("decimal(38,0)")).as("s1"))
      .select(col("c_mktsegment"), col("n_customers"), col("total_cents"),
        round((lit(2).cast("decimal(38,0)") * col("s1") -
               (col("n_customers") + 1).cast("decimal(38,0)") *
                 col("total_cents").cast("decimal(38,0)")).cast("double") /
              (col("n_customers").cast("double") *
               col("total_cents").cast("double")), 6).as("gini"))
      .orderBy("c_mktsegment")
  }

  /** Mutual information between event type and value band — the
    * dependence screen a feature-selection pass runs over categorical
    * pairs. Bands reuse the histogram's exact integer-cents binning;
    * MI and both entropies are sums over the BOUNDED cell table
    * (types × bands), each term an exact-integer ratio pushed through
    * ln as identical doubles. The fact stream is touched once (joint
    * counts); marginals and the total derive from the cell table.
    */
  def mutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("""(cast(round(value * 100) as bigint)
               | - ((cast(round(value * 100) as bigint) % 2000) + 2000) % 2000)
               | div 2000""".stripMargin).as("band"))
      .groupBy("event_type", "band")
      .agg(count(lit(1)).as("c_xy"))
      .localCheckpoint() // bounded: |types| x |bands|
    val cx = cells.groupBy("event_type").agg(sum("c_xy").as("c_x"))
    val cy = cells.groupBy("band").agg(sum("c_xy").as("c_y"))
    val n  = cells.agg(sum("c_xy").as("n"))
    cells.join(broadcast(cx), "event_type").join(broadcast(cy), "band")
      .crossJoin(broadcast(n))
      .select(
        (col("c_xy") / col("n") *
          log((col("c_xy") * col("n")).cast("double") / (col("c_x") * col("c_y"))))
          .as("mi_term"))
      .agg(
        count(lit(1)).as("n_cells"),
        round(sum(col("mi_term")), 6).as("mi"))
      .crossJoin(broadcast(
        cx.crossJoin(n).agg(round(-sum(col("c_x") / col("n") *
          log(col("c_x").cast("double") / col("n"))), 6).as("h_type"))))
      .crossJoin(broadcast(
        cy.crossJoin(n).agg(round(-sum(col("c_y") / col("n") *
          log(col("c_y").cast("double") / col("n"))), 6).as("h_band"))))
      .select("n_cells", "mi", "h_type", "h_band")
  }

  /** TPC-H Q7-class two-nation trade flow: revenue shipped between a
    * nation pair (both directions kept separate) by ship year. The
    * nation filter is applied INSIDE the supplier/customer dimension
    * joins — the classic Q7 rewrite — so the fact-side joins see only
    * rows that can survive, and the residual pair filter merely drops
    * the two same-nation combinations. Nation broadcasts from its
    * size; supplier/customer keep size-based join selection (they grow
    * with the corpus). The date filter reaches the parquet scan.
    */
  def nationTrade(spark: SparkSession, dir: String,
                  nationA: String = "NATION_11",
                  nationB: String = "NATION_12"): DataFrame = {
    val nat = Tables.nation(spark, dir)
      .filter(col("n_name").isin(nationA, nationB))
      .select("n_nationkey", "n_name")
    val sup = Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_nationkey")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
      .join(Tables.orders(spark, dir).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)") *
               (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Market-basket co-occurrence (the a-priori first step, Agrawal-
    * Srikant 1994): the top part pairs by number of orders containing
    * both, with per-pair LIFT = P(ab)/(P(a)P(b)) — computed as the
    * exact integer ratio n_co·N / (n_a·n_b) so both engines divide
    * identical operands. Pairs come from the per-order self-join —
    * fan-out bounded by basket size squared (baskets are small by
    * domain; a mega-basket guard would cap or salt them), NEVER an
    * all-parts cross product.
    *
    * Scale shape: the distinct (order, part) projection is the only
    * corpus-sized shuffle; pair counts aggregate on 8-byte key pairs
    * with map-side partials; the top-k is TakeOrdered; frequency and
    * the 1-row order count broadcast into the k-row result.
    */
  def marketBasket(spark: SparkSession, dir: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .localCheckpoint() // consumers: order count, frequencies, both join sides
    val nOrders = items.agg(countDistinct(col("ok")).as("n_orders"))
    val freq = items.groupBy("pk").agg(count(lit(1)).as("cnt"))
    val top = items.as("a").join(items.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("pa"), col("b.pk").as("pb"))
      .agg(count(lit(1)).as("n_co"))
      .orderBy(col("n_co").desc, col("pa"), col("pb")).limit(topK)
    // the k-row top side broadcasts into the parts-sized frequency
    // table (never the reverse: freq grows with the corpus)
    broadcast(top)
      .join(freq.select(col("pk").as("pa"), col("cnt").as("n_a")), Seq("pa"))
      .join(freq.select(col("pk").as("pb"), col("cnt").as("n_b")), Seq("pb"))
      .crossJoin(broadcast(nOrders))
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("n_co").desc, col("pa"), col("pb"))).cast("bigint"))
      .select(col("rk"), col("pa"), col("pb"), col("n_co"), col("n_a"), col("n_b"),
        round((col("n_co") * col("n_orders")).cast("double") / (col("n_a") * col("n_b")), 6)
          .as("lift"))
      .orderBy("rk")
  }

  /** k-anonymity suppression audit over the event export surface —
    * the privacy gate a telemetry rollup passes before leaving the
    * trust boundary (Sweeney 2002): any (event_type, hour) cell whose
    * distinct-user count is below `k` re-identifies its members, so
    * it must be suppressed; this audit prices that suppression per
    * event type (cells lost, events lost, share of the stream).
    * Suppression here is the MEASUREMENT; the action is the same
    * filter applied before export.
    *
    * Scale shape: one cell aggregate (the distinct-user count rides
    * the same shuffle as the event count), then an event-type-sized
    * rollup — nothing after the first aggregate is corpus-sized.
    */
  def kAnonSuppression(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).cast("long").as("hour_s"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"))
    cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"),
           sum(when(col("n_users") < k, 1L).otherwise(0L)).as("n_suppressed"),
           sum(col("n_events")).as("n_events_total"),
           sum(when(col("n_users") < k, col("n_events")).otherwise(0L))
             .as("n_events_suppressed"))
      .withColumn("suppressed_share",
        round(col("n_events_suppressed").cast("double") / col("n_events_total"), 6))
      .orderBy("event_type")
  }

  /** Taps of the truncated EMA window (coefficients 2^-j, j < EmaTaps). */
  val EmaTaps = 16

  /** Exponentially weighted moving average of `value` per user — the
    * financial-smoothing sibling of the reference's SMA
    * (`financial_engine.py:293-312` computes the simple form; EMA is
    * what production quote pipelines actually smooth with), in the
    * adjusted form ema_t = Σ_j (1-α)^j x_{t-j} / Σ_j (1-α)^j,
    * truncated at [[EmaTaps]] taps. α = 1/2 ON PURPOSE: every
    * coefficient is a power of two, and values quantize to exact
    * integer cents (round(value·100)), so numerator and denominator
    * are exact BIGINT sums — the whole smoothing is engine-exact
    * integer arithmetic with ONE final double division (the
    * [[graft.operators.Similarity]] micro-unit discipline applied to
    * time-series smoothing). The 16-tap truncation costs < 2^-16 of
    * the mass — below the 6 dp output rounding.
    *
    * Scale shape: one window per user (ordered by ts with event_id
    * tie-break), 16 unrolled codegen'd lag terms — no self-joins, no
    * UDFs, one exchange on user_id.
    */
  def emaPerUser(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val m = round(col("value") * 100).cast("bigint")
    val terms = (0 until EmaTaps).map { j =>
      val weight = 1L << (EmaTaps - 1 - j)
      val lagM = lag(col("m"), j).over(w)
      (coalesce(lagM * weight, lit(0L)),
       when(lagM.isNotNull, lit(weight)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("m", m)
      .select(col("user_id"), col("event_id"), col("value"),
        round(num.cast("double") / (den * 100L), 6).as("ema"))
      .orderBy("event_id")
  }

  /** Ordered three-step event funnel (signup → first click within
    * `windowHours` of the signup → first purchase within
    * `windowHours` of that click) with per-step user counts and
    * conversion vs step 1 — the sequential-pattern rollup
    * [[hourlyEventAgg]]-style bucket aggs cannot express, because each
    * step's clock starts at the PREVIOUS step's event and the window
    * constrains the gap, not the absolute time. Output is steps-sized;
    * no timestamps escape (counts and shares only), so the oracle
    * compares integers and one rounded ratio.
    *
    * Scale shape: three narrow type-filtered passes, each aggregated
    * per user then equi-joined on user_id (step n+1 only scans its
    * own event type against the step-n user table); no windows over
    * the full stream, no cross products; the final union is
    * steps-sized and the step-1 denominator broadcasts.
    */
  def eventFunnel(spark: SparkSession, dir: String,
                  windowHours: Int = 24): DataFrame = {
    val ev = Tables.events(spark, dir).select("user_id", "event_type", "ts")
    val w = expr(s"INTERVAL $windowHours HOURS")
    val t1 = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, Seq("user_id"))
      .filter(col("ts") >= col("t1") && col("ts") <= col("t1") + w)
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id"))
      .filter(col("ts") >= col("t2") && col("ts") <= col("t2") + w)
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    def level(df: DataFrame, no: Long, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(no).as("step_no"), lit(name).as("step"), col("n_users"))
    val steps = level(t1, 1L, "signup")
      .unionByName(level(t2, 2L, "click_after_signup"))
      .unionByName(level(t3, 3L, "purchase_after_click"))
    steps
      .crossJoin(broadcast(t1.agg(count(lit(1)).as("n0"))))
      .select(col("step_no"), col("step"), col("n_users"),
        round(col("n_users").cast("double") / col("n0"), 6).as("share"))
      .orderBy("step_no")
  }

  /** Robust outlier audit: median/MAD control limits per event type —
    * the skew-immune twin of [[zscoreOutliers]] (a handful of extreme
    * ticks cannot drag the center or the spread the way they drag
    * mean/stddev). An event is an outlier when
    * |v - median| > 4.4478 · MAD (3σ-equivalent under normality,
    * 1.4826·3 written as ONE literal so both engines scale by the
    * identical double). Exact medians via interpolated percentile;
    * at 100 TB swap for approx_percentile (t-digest) — same two-pass
    * shape, the pairing this repo uses for distinct/approx-distinct.
    *
    * Scale shape: two grouped aggregates over the fact stream with the
    * event-type-sized stats table broadcast back between them; the
    * output is event-type-sized.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select("event_type", "value")
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("value") - col("med")))
    val stats = dev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           max(col("med")).as("med_raw"),
           expr("percentile(dev, 0.5)").as("mad_raw"))
    val outliers = dev
      .join(broadcast(stats.select("event_type", "mad_raw")), "event_type")
      .filter(col("dev") > lit(4.4478) * col("mad_raw"))
      .groupBy("event_type").agg(count(lit(1)).as("n_outliers"))
    stats.join(outliers, Seq("event_type"), "left")
      .withColumn("n_outliers", coalesce(col("n_outliers"), lit(0L)))
      .select(col("event_type"), col("n_events"),
        round(col("med_raw"), 6).as("med"),
        round(col("mad_raw"), 6).as("mad"),
        col("n_outliers"),
        round(col("n_outliers") / col("n_events"), 6).as("outlier_share"))
      .orderBy("event_type")
  }

  /** RFM customer segmentation: recency (latest order date), frequency
    * (order count), monetary (exact-decimal spend) per customer, each
    * split into `k` equal bands by DISTRIBUTED global rank
    * ([[CorpusOps.withGlobalRank]]: range partition + bounded
    * partition-count collect — never a single-reducer ROW_NUMBER).
    * Ties break on custkey, so the banding is a total order and
    * engine-exact; band = ((rank-1)·k) div total + 1, identical under
    * floor and truncating integer division since all terms are
    * non-negative. Output is the k³-row segment grid — bounded at any
    * scale.
    */
  def rfmSegments(spark: SparkSession, dir: String, k: Int = 4): DataFrame = {
    val base = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast("decimal(18,6)")).as("mon"))
    val (r1, total) = CorpusOps.withGlobalRank(base,
      Seq(col("last_order").desc, col("o_custkey")), "rr")
    val (r2, _) = CorpusOps.withGlobalRank(r1,
      Seq(col("freq").desc, col("o_custkey")), "rf")
    val (r3, _) = CorpusOps.withGlobalRank(r2,
      Seq(col("mon").desc, col("o_custkey")), "rm")
    def band(c: String) = (expr(s"(($c - 1) * $k) div $total") + 1).cast("bigint")
    r3
      .withColumn("r_band", band("rr"))
      .withColumn("f_band", band("rf"))
      .withColumn("m_band", band("rm"))
      .groupBy("r_band", "f_band", "m_band")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("freq")).as("total_orders"),
        sum(col("mon")).cast("double").as("total_spend"))
      .orderBy("r_band", "f_band", "m_band")
  }

  /** Last-touch attribution: for each user's FIRST purchase, the event
    * type immediately preceding it in the user's (ts, id) tick order
    * ('none' when the purchase opens the stream). The window and both
    * aggregations partition by user — no global ordering; the final
    * rollup is #event_types rows.
    */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts_epoch").asc, col("event_id").asc)
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_epoch"))
      .withColumn("rn", row_number().over(ord))
    val fp = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("rn")).as("fp_rn"))
    val prev = e.select(col("user_id").as("puid"), col("rn").as("prn"),
      col("event_type").as("prev_type"))
    fp.join(prev,
        col("puid") === col("user_id") && col("prn") === col("fp_rn") - 1,
        "left")
      .select(coalesce(col("prev_type"), lit("none")).as("touch_type"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("touch_type")
  }

  /** Linear multi-touch attribution — the complement of
    * [[lastTouchAttribution]]: every event on a user's path BEFORE
    * their first purchase shares the conversion credit equally
    * (credit = 1/n per touch, the "linear" model of marketing
    * attribution). Credit is QUANTIZED at 6 decimals per touch and
    * summed as DECIMAL — the model definition both engines reproduce
    * bit-exactly regardless of aggregation order (a raw double sum of
    * 1/n terms would drift). Users whose first event is the purchase
    * have an empty path and appear in no row — the model scores
    * touches, not conversions.
    *
    * Scale shape: one (user_id) window for the path order (shared
    * with the purchase argmin), one user-keyed size join, one
    * event_type-sized rollup — same single-exchange family as
    * last-touch.
    */
  def linearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("user_id")
      .orderBy(col("ts_epoch").asc, col("event_id").asc)
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_epoch"))
      .withColumn("rn", row_number().over(ord))
    val fp = e.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("rn")).as("fp_rn"))
    val path = e.join(fp, "user_id").filter(col("rn") < col("fp_rn"))
      .localCheckpoint() // two consumers: sizes + the credit rollup
    val sizes = path.groupBy("user_id").agg(count(lit(1)).as("path_len"))
    path.join(sizes, "user_id")
      .select(col("event_type").as("touch_type"),
        round(lit(1.0) / col("path_len"), 6).cast("decimal(18,6)").as("credit"))
      .groupBy("touch_type")
      .agg(count(lit(1)).as("n_events"),
           sum(col("credit")).cast("double").as("credit"))
      .orderBy("touch_type")
  }

  /** Data-profiling sweep over lineitem's key/dimension columns: one
    * stack (unpivot) pass producing (column, value-string) rows, then a
    * two-phase grouped profile — row count, non-null count, EXACT
    * distinct, lexicographic min/max. The unpivot is a narrow map (no
    * shuffle until the 7-group aggregate); exact distinct shuffles
    * (col_name, value) — at 100 TB swap `countDistinct` for
    * `approx_count_distinct` (HLL), same plan shape minus the expand.
    * Doubles are deliberately excluded: their string rendering is
    * engine-specific; keys, flags, and an explicitly formatted date
    * profile exactly.
    */
  def columnProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(expr(
        """stack(7,
          |  'l_orderkey',   cast(l_orderkey as string),
          |  'l_partkey',    cast(l_partkey as string),
          |  'l_suppkey',    cast(l_suppkey as string),
          |  'l_linenumber', cast(l_linenumber as string),
          |  'l_returnflag', l_returnflag,
          |  'l_linestatus', l_linestatus,
          |  'l_shipdate',   date_format(l_shipdate, 'yyyy-MM-dd')
          |) as (col_name, v)""".stripMargin))
      // pre-aggregate on (column, value) instead of countDistinct: the
      // map-side partial collapses duplicate values BEFORE the shuffle
      // and avoids the exact-distinct Expand that would double the
      // unpivoted stream (measured 10.9 s -> ~3 s at sf0.1); the
      // second aggregate is value-cardinality-sized
      .groupBy("col_name", "v")
      .agg(count(lit(1)).as("c"))
      .groupBy("col_name")
      .agg(
        sum(col("c")).as("n_rows"),
        sum(when(col("v").isNotNull, col("c")).otherwise(0L)).as("n_present"),
        count(col("v")).as("n_distinct"),
        min(col("v")).as("min_v"),
        max(col("v")).as("max_v"))
      .orderBy("col_name")

  /** TPC-H Q21-class "suppliers who kept an order waiting": suppliers
    * whose line shipped more than `lateDays` after the order date in
    * a MULTI-supplier order where no other supplier was late — the
    * classic double-EXISTS decorrelation exercise. The oracle states
    * it in the textbook EXISTS / NOT-EXISTS form (an independent
    * derivation, the customer-skyline discipline); the Spark plan
    * rewrites both correlated subqueries into ONE per-order aggregate:
    * EXISTS(other supplier) ⟺ n_suppliers > 1, NOT EXISTS(other late
    * supplier) ⟺ n_late_suppliers = 1 given this supplier is late.
    *
    * Scale shape: one lineitem-orders equi-join, one per-order
    * aggregate (map-side combined), one 8-byte-key join back, a
    * per-supplier count, TakeOrdered top-k — no correlated-subquery
    * re-scans, no row-per-row probes.
    */
  def waitingSuppliers(spark: SparkSession, dir: String,
                       lateDays: Int = 60, topK: Int = 20): DataFrame = {
    val j = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), to_date(col("l_shipdate")).as("sd"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late", datediff(col("sd"), col("od")) > lateDays)
      .localCheckpoint()
    val perOrder = j.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
           countDistinct(when(col("is_late"), col("l_suppkey"))).as("n_late"))
    val lateSup = j.filter(col("is_late"))
      .select("l_orderkey", "l_suppkey").distinct()
    val counts = lateSup
      .join(perOrder.filter(col("n_supp") > 1 && col("n_late") === 1), "l_orderkey")
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("numwait"))
    val top = counts.orderBy(col("numwait").desc, col("suppkey")).limit(topK)
    broadcast(top)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("numwait").desc, col("suppkey"))).cast("bigint"))
      .select("rk", "suppkey", "numwait")
      .orderBy("rk")
  }

  /** Kaplan-Meier estimator of repeat-purchase survival: duration =
    * days from a customer's first order to their second (event), or
    * to the last observed order date (right-censored). One row per
    * event time with the risk set, event/censor counts, and the
    * product-limit survival estimate — the churn-analysis primitive
    * (how long until a customer comes back, honestly accounting for
    * the ones who haven't yet).
    *
    * Determinism: counts are integers; each hazard factor
    * ln(1 - d/n) is round-12 then DECIMAL(18,12) so the cumulative
    * log-survival is an exact decimal sum (the x_bigram_ppl
    * discipline), and the final exp/round-6 maps identical decimals
    * through identical doubles. A terminal time with d = n (risk set
    * exhausted) yields NULL survival on both engines (S = 0, outside
    * log space).
    *
    * Scale shape: the corpus-sized work is one (customer) window for
    * first/second orders and one groupBy(t); the KM recursion then
    * runs over the DURATION-DISTINCT table, bounded by the calendar
    * span like Benford's 9-row rollup — a global window over it is
    * bounded at any corpus scale.
    */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"), col("o_orderkey"))
    val byCust = Window.partitionBy("o_custkey").orderBy(col("d").asc, col("o_orderkey").asc)
    val ranked = o.withColumn("rn", row_number().over(byCust))
      .filter(col("rn") <= 2)
      .localCheckpoint()
    val first  = ranked.filter(col("rn") === 1).select(col("o_custkey"), col("d").as("d0"))
    val second = ranked.filter(col("rn") === 2).select(col("o_custkey"), col("d").as("d1"))
    val dmax = o.agg(max(col("d")).as("dmax")) // 1-row bound
    val dur = first.join(second, Seq("o_custkey"), "left")
      .crossJoin(broadcast(dmax))
      .select(
        when(col("d1").isNotNull, datediff(col("d1"), col("d0")))
          .otherwise(datediff(col("dmax"), col("d0"))).cast("long").as("t"),
        when(col("d1").isNotNull, lit(1L)).otherwise(lit(0L)).as("ev"))
    val byT = dur.groupBy("t")
      .agg(sum(col("ev")).as("d_events"),
           sum(lit(1L) - col("ev")).as("c_censored"),
           count(lit(1)).as("n_at"))
    val ordT = Window.orderBy(col("t").asc)
    byT
      .withColumn("n_risk",
        sum(col("n_at")).over(ordT.rowsBetween(Window.unboundedPreceding,
                                               Window.unboundedFollowing)) -
        coalesce(sum(col("n_at")).over(ordT.rowsBetween(Window.unboundedPreceding, -1)),
                 lit(0L)))
      .filter(col("d_events") > 0)
      .withColumn("factor",
        when(col("d_events") < col("n_risk"),
          round(log(lit(1.0) - col("d_events").cast("double") / col("n_risk")), 12)
            .cast("decimal(18,12)")))
      .withColumn("cum", sum(col("factor")).over(ordT.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("t").as("t_days"), col("n_risk"), col("d_events"), col("c_censored"),
        round(exp(col("cum").cast("double")), 6).as("km_survival"))
      .orderBy("t_days")
  }

  /** TPC-H Q13-class customer order-count distribution: how many
    * customers placed exactly k (non-urgent) orders, INCLUDING the
    * zero-order customers the left join keeps — the histogram behind
    * engagement/churn cohorts. Two hash aggregations; the second runs
    * over the order-count-DISTINCT table (bounded by the max order
    * count, not the customer count). All-integer output.
    */
  def custDistribution(spark: SparkSession, dir: String,
                       excludePriority: String = "1-URGENT"): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= excludePriority)
      .select("o_custkey", "o_orderkey")
    Tables.customer(spark, dir).select("c_custkey")
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14-class promotion revenue share per ship month: the
    * percent of discounted revenue from PROMO-type parts. The part dim
    * broadcasts (parts ≪ lineitems at every scale); revenue terms are
    * exact DECIMAL(18,6) sums per month, and the share divides the two
    * decimal sums through the correctly-rounded decimal→double cast
    * (identical doubles in both engines) before the round-6.
    */
  def promoRevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_shipdate"), rev.as("rev"))
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("mon", date_format(col("l_shipdate"), "yyyy-MM"))
      .groupBy("mon")
      .agg(sum(when(col("p_type") === "PROMO", col("rev"))
             .otherwise(lit(0).cast("decimal(18,6)"))).as("promod"),
           sum(col("rev")).as("totald"))
      .select(col("mon"),
        round(lit(100.0) * col("promod").cast("double") / col("totald").cast("double"), 6)
          .as("promo_share"),
        col("totald").cast("double").as("revenue"))
      .orderBy("mon")
  }

  /** TPC-H Q10-class returned-item ranking: the topK customers by
    * revenue lost to returns (l_returnflag = 'R') in a half-year
    * window, with nation names. Revenue is the exact DECIMAL(18,6)
    * sum, so the top-K cut (revenue DESC, custkey) has no float-tie
    * ambiguity; the double cast happens after the cut. One (custkey)
    * aggregation, then TakeOrdered — never a global sort at scale.
    */
  def returnedItemCustomers(spark: SparkSession, dir: String,
                            topK: Int = 20): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1997-07-01 00:00:00")))
      .select("o_orderkey", "o_custkey")
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), rev.as("rev"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir)
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(sum(col("rev")).as("revd"))
      .orderBy(col("revd").desc, col("c_custkey").asc)
      .limit(topK)
      .select(col("c_custkey"), col("c_name"),
        col("revd").cast("double").as("revenue"), col("c_acctbal"), col("n_name"))
  }

  /** TPC-H Q15-class top supplier: the supplier(s) whose discounted
    * revenue over one quarter equals the maximum — tie-PRESERVING, the
    * point of Q15's view-with-max formulation. The per-supplier
    * aggregate is exact decimal, the 1-row max broadcasts back, and
    * equality compares exact decimals (no float max ambiguity).
    */
  def topRevenueSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    val perSupp = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
      .select(col("l_suppkey"), rev.as("rev"))
      .groupBy("l_suppkey")
      .agg(sum(col("rev")).as("revd"))
    val mx = perSupp.agg(max(col("revd")).as("mx")) // 1-row bound
    perSupp.crossJoin(broadcast(mx))
      .filter(col("revd") === col("mx"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("revd").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q2-class minimum-cost supplier per part, adapted to this
    * schema: the "catalog" is the observed lineitem unit price
    * (extendedprice/quantity in integer cents — IEEE division then the
    * house round, identical in both engines). Per (part, supplier) the
    * best offer is min cents; per part the winner is the cheapest
    * offer, smallest suppkey on ties. Two hash aggregations on the
    * part key plus broadcast dim joins — no correlated per-row
    * subquery survives into the plan (the Q2 decorrelation done by
    * hand). Supplier/nation/part dims broadcast at any scale.
    */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") / col("l_quantity") * 100).cast("bigint")
          .as("unit_cents"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min(col("unit_cents")).as("cost_cents"))
    val best = ps.groupBy("l_partkey").agg(min(col("cost_cents")).as("best_cents"))
      .withColumnRenamed("l_partkey", "b_partkey")
    ps.join(best,
        col("l_partkey") === col("b_partkey") &&
        col("cost_cents") === col("best_cents"))
      .groupBy("l_partkey", "best_cents")
      .agg(min(col("l_suppkey")).as("suppkey"))
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select("s_suppkey", "s_name", "s_nationkey")),
        col("suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_brand"), col("suppkey"), col("s_name"),
        col("n_name"), (col("best_cents").cast("double") / 100.0).as("unit_cost"))
      .orderBy("p_partkey")
  }

  /** TPC-H Q17-class small-quantity revenue per brand: lines whose
    * quantity is below 20% of their part's average quantity, total
    * extendedprice / 7 ("yearly loss to small orders"). Quantities are
    * integral, so the correlated avg comparison is EXACT integer
    * arithmetic (5·qty·n < Σqty — no float avg anywhere); the revenue
    * is a decimal sum. The per-part aggregate joins back on the part
    * key — one shuffle each side, decorrelated by construction.
    */
  def smallQtyBrandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity").cast("bigint").as("qty"),
        col("l_extendedprice"))
    val pa = li.groupBy("l_partkey")
      .agg(sum(col("qty")).as("qsum"), count(lit(1)).as("qcnt"))
    li.join(pa, "l_partkey")
      .filter(col("qty") * 5 * col("qcnt") < col("qsum"))
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double") / 7.0, 6)
          .as("avg_yearly"))
      .orderBy("p_brand")
  }

  /** TPC-H Q22-class lapsed high-balance customers: per nation, the
    * count and total balance of customers with above-average positive
    * balance and NO order on/after the cutoff (this corpus has no
    * order-free customers, so Q22's "never ordered" becomes "lapsed" —
    * same anti-join shape with a pushed date filter). The global
    * average gate is exact integer cents (bal·n > Σbal over the 1-row
    * broadcast stats), the lapse test is a left-anti join (null-safe,
    * never IN), and the rollup is nation-sized. Cent sums divide by
    * 100.0 once.
    */
  def balanceNoOrders(spark: SparkSession, dir: String,
                      cutoff: String = "1999-01-01 00:00:00"): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("bigint").as("bal_cents"))
    val stats = c.filter(col("bal_cents") > 0)
      .agg(sum(col("bal_cents")).as("tot"), count(lit(1)).as("n")) // 1-row bound
    c.crossJoin(broadcast(stats))
      .filter(col("bal_cents") * col("n") > col("tot"))
      .join(Tables.orders(spark, dir)
          .filter(col("o_orderdate") >= to_timestamp(lit(cutoff)))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("numcust"),
        (sum(col("bal_cents")).cast("double") / 100.0).as("totacctbal"))
      .orderBy("n_name")
  }

  /** Bloom-filter membership audit in EXACT integer bit arithmetic:
    * build an m-bit, k=3 Bloom filter over one market segment's
    * customer keys (positions hᵢ(key) = ((key·aᵢ+bᵢ) mod p) mod m),
    * probe every customer, and report per segment how many keys the
    * filter claims — the false-positive rate measured, not estimated
    * (the HLL/t-digest "measure, don't claim" discipline applied to
    * the classic membership sketch). A probe passes when ALL THREE of
    * its hash slots are set; duplicate slot collisions within one key
    * count per hash test, matching the k-probe semantics.
    *
    * Scale shape: the bit set is DISTINCT positions ≤ m (65536) — a
    * bounded broadcast at any corpus scale; probes explode to 3 rows
    * per key and equi-join the bit table; no floats anywhere until
    * the final rate divides.
    */
  def bloomAudit(spark: SparkSession, dir: String, m: Int = 65536,
                 segment: String = "BUILDING"): DataFrame = {
    val P = 1000000007L
    val hashes = Seq((31L, 7L), (131L, 911L), (8191L, 131071L))
    def pos(key: Column, ab: (Long, Long)): Column =
      (key * ab._1 + ab._2) % P % m
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_mktsegment")
    val bits = cust.filter(col("c_mktsegment") === segment)
      .select(explode(array(hashes.map(pos(col("c_custkey"), _)): _*)).as("pos"))
      .distinct()
      .localCheckpoint() // bounded by m — broadcastable at any scale
    val nBits = bits.agg(count(lit(1)).as("bits_set")) // 1-row bound
    val probes = cust
      .select(col("c_custkey"), col("c_mktsegment"),
        explode(array(hashes.map(pos(col("c_custkey"), _)): _*)).as("pos"))
    val hitPerKey = probes.join(broadcast(bits), "pos")
      .groupBy("c_custkey").agg(count(lit(1)).as("nhit"))
    cust.join(hitPerKey, Seq("c_custkey"), "left")
      .withColumn("predicted", coalesce(col("nhit"), lit(0L)) === 3)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_keys"),
           sum(when(col("predicted"), 1L).otherwise(0L)).as("n_predicted"))
      .crossJoin(broadcast(nBits))
      .select(col("segment"),
        (col("segment") === segment).as("is_member_segment"),
        col("n_keys"), col("n_predicted"),
        round(col("n_predicted").cast("double") / col("n_keys"), 6).as("pred_rate"),
        col("bits_set"), lit(m.toLong).as("m_bits"))
      .orderBy("segment")
  }

  /** Herfindahl–Hirschman revenue concentration per supplier nation:
    * HHI = Σ (100·share)² over each nation's suppliers — the market-
    * structure screen beside [[nationMarketShare]]. Per-supplier
    * revenue is an exact decimal sum; shares divide the correctly-
    * rounded double images, are rounded to 6 and LOCKED into
    * DECIMAL(12,6) before squaring, so the square and the final sum
    * are exact decimal arithmetic (no float summation order). The
    * outer rollup and its window are supplier-nation-sized (bounded
    * by the dims, not the corpus).
    */
  def revenueConcentration(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    val perSupp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), rev.as("rev"))
      .groupBy("l_suppkey")
      .agg(sum(col("rev")).as("revd"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("revd"))
    val wNat = Window.partitionBy("n_name")
    perSupp
      .withColumn("totd", sum(col("revd")).over(wNat)) // exact decimal window sum
      .withColumn("share6",
        round(lit(100.0) * col("revd").cast("double") / col("totd").cast("double"), 6)
          .cast("decimal(12,6)"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_suppliers"),
           sum(col("share6") * col("share6")).as("hhid")) // exact decimal sum
      .select(col("n_name"), col("n_suppliers"),
        round(col("hhid").cast("double"), 6).as("hhi"))
      .orderBy("n_name")
  }

  /** TPC-H Q8-class national market share: within one region's
    * customer market, the yearly share of discounted revenue supplied
    * by one nation's suppliers. Numerator and denominator are exact
    * decimal sums per year; the share divides their correctly-rounded
    * double images. Dims broadcast; the fact work is one (year)
    * aggregate after the usual star joins.
    */
  def nationMarketShare(spark: SparkSession, dir: String,
                        region: String = "ASIA",
                        nation: String = "NATION_5"): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === region)
    val natC = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey"))
    val natS = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), rev.as("rev"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("bigint").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
      .groupBy("o_year")
      .agg(sum(when(col("supp_nation") === nation, col("rev"))
             .otherwise(lit(0).cast("decimal(18,6)"))).as("natd"),
           sum(col("rev")).as("totald"))
      .select(col("o_year"),
        round(col("natd").cast("double") / col("totald").cast("double"), 6)
          .as("mkt_share"),
        col("totald").cast("double").as("revenue"))
      .orderBy("o_year")
  }

  /** Two-feature OLS via normal equations, per brand: price_cents ~
    * b0 + b1·quantity + b2·discount_bp, solved in closed form by
    * Cramer's rule on the 3×3 normal matrix. ALL nine moment sums are
    * EXACT integers (quantity and discount basis points are integral,
    * price is cents; Σy² rides a decimal to dodge the BIGINT ceiling),
    * so both engines enter the determinant arithmetic with identical
    * values; the determinants themselves are IEEE doubles under an
    * IDENTICAL parenthesization on both sides — the moments/skewness
    * double-bridge discipline extended to a linear solve. One hash
    * aggregation over the fact (map-side partial), brand-sized
    * output, the regression math on 9 numbers per group. Degenerate
    * groups (det = 0: constant feature) drop identically. Headroom:
    * Σqty·y ≤ ~9e18 holds to ~10^12 max-priced lines per brand.
    */
  def olsPricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        col("l_quantity").cast("bigint").as("x1"),
        round(col("l_discount") * 100).cast("bigint").as("x2"),
        round(col("l_extendedprice") * 100).cast("bigint").as("y"))
    val agged = li.groupBy("p_brand").agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("y")).as("sy"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).cast("double").as("syy"))
    val d = Seq("n", "s1", "s2", "s11", "s22", "s12", "sy", "s1y", "s2y")
      .map(c => c -> col(c).cast("double")).toMap
    val det = d("n") * (d("s11") * d("s22") - d("s12") * d("s12")) -
      d("s1") * (d("s1") * d("s22") - d("s2") * d("s12")) +
      d("s2") * (d("s1") * d("s12") - d("s2") * d("s11"))
    val det0 = d("sy") * (d("s11") * d("s22") - d("s12") * d("s12")) -
      d("s1") * (d("s1y") * d("s22") - d("s2y") * d("s12")) +
      d("s2") * (d("s1y") * d("s12") - d("s2y") * d("s11"))
    val det1 = d("n") * (d("s1y") * d("s22") - d("s2y") * d("s12")) -
      d("sy") * (d("s1") * d("s22") - d("s2") * d("s12")) +
      d("s2") * (d("s1") * d("s2y") - d("s2") * d("s1y"))
    val det2 = d("n") * (d("s11") * d("s2y") - d("s12") * d("s1y")) -
      d("s1") * (d("s1") * d("s2y") - d("s2") * d("s1y")) +
      d("sy") * (d("s1") * d("s12") - d("s2") * d("s11"))
    agged
      .withColumn("det", det)
      .filter(col("det") =!= 0.0)
      .withColumn("b0", det0 / col("det"))
      .withColumn("b1", det1 / col("det"))
      .withColumn("b2", det2 / col("det"))
      .select(col("p_brand"), col("n").as("n_lines"),
        round(col("b0"), 6).as("b0_cents"),
        round(col("b1"), 6).as("b1_cents_per_qty"),
        round(col("b2"), 6).as("b2_cents_per_bp"),
        round(lit(1.0) -
          (col("syy") - col("b0") * d("sy") - col("b1") * d("s1y") -
           col("b2") * d("s2y")) /
          (col("syy") - d("sy") * d("sy") / d("n")), 6).as("r2"))
      .orderBy("p_brand")
  }

  /** TPC-H Q9-class product-line profit by supplier nation and order
    * year, adapted to this schema: with no partsupp supply cost, the
    * cost model is 60% of the part's retail price per unit (a fixed,
    * documented margin assumption — the query SHAPE, a 4-way star join
    * feeding a (nation, year) rollup, is what Q9 exercises). Profit is
    * EXACT INTEGER arithmetic in 10^-4-dollar units:
    * e·(100−d) − 60·r·q with e = extended-price cents, d = discount
    * hundredths, r = retail cents, q = integral quantity — no decimal
    * tower, no float sum. Part filter (name word) broadcasts pruned;
    * supplier/nation broadcast; the one big-big join is
    * lineitem⋈orders on the order key. Headroom: a single (nation,
    * year) cell holds ~9e18/1e9 ≈ 9e9 max-priced lines — beyond any
    * yearly corpus; past it the same query rides dsum.
    */
  def profitByNation(spark: SparkSession, dir: String,
                     nameWord: String = "red"): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("bigint").as("e"),
        round(col("l_discount") * 100).cast("bigint").as("d"),
        col("l_quantity").cast("bigint").as("q"))
    val pt = Tables.part(spark, dir)
      .filter(col("p_name").contains(nameWord))
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("bigint").as("r"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).cast("bigint").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(spark, dir).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg(count(lit(1)).as("n_lines"),
           sum(col("e") * (lit(100L) - col("d")) - lit(60L) * col("r") * col("q"))
             .as("p4"))
      .select(col("nation"), col("o_year"), col("n_lines"),
        (col("p4").cast("double") / 10000.0).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11-class important stock, adapted: with no partsupp
    * availqty, "stock value" is the observed trade value (exact
    * decimal revenue sum) of each part supplied by ONE REGION's
    * suppliers (region, not Q11's single nation: this corpus's small
    * SFs leave some nations supplier-less, while every region is
    * populated at every scale); a part is important when its value
    * exceeds 0.1% of the region's total — the gate compares
    * value·1000 > total in EXACT DECIMALS (Q11's HAVING-vs-scalar-
    * subquery decorrelated to a 1-row broadcast). Share-based, so the
    * same parameters work at every scale factor. Per-part aggregate =
    * one (partkey) exchange; dims broadcast.
    */
  def importantStock(spark: SparkSession, dir: String,
                     region: String = "EUROPE"): DataFrame = {
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === region).select("r_regionkey")),
        col("n_regionkey") === col("r_regionkey"))
      .select("s_suppkey")
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), rev.as("rev"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(col("rev")).as("vald"))
    val tot = perPart.agg(sum(col("vald")).as("totd")) // 1-row bound
    perPart.crossJoin(broadcast(tot))
      .filter(col("vald") * 1000 > col("totd"))
      .select(col("l_partkey").as("p_partkey"),
        col("vald").cast("double").as("value"),
        round(col("vald").cast("double") / col("totd").cast("double"), 6)
          .as("share"))
      .orderBy("p_partkey")
  }

  /** TPC-H Q16-class supplier-count census per (brand, type, size):
    * how many distinct suppliers offer each part configuration,
    * excluding a supplier blacklist (Q16's complaints filter adapted
    * to negative account balance — same NOT-IN-decorrelated-to-
    * anti-join shape). The "catalog" is the DISTINCT observed
    * (part, supplier) pairs from lineitem — the partsupp proxy this
    * schema offers; part-config filters are Q16's (brand excluded,
    * one type excluded, size whitelist). Count-distinct rides the
    * (brand, type, size) exchange; part/blacklist broadcast.
    */
  def supplierPartCounts(spark: SparkSession, dir: String,
                         excludeBrand: String = "Brand#1",
                         excludeType: String = "PROMO",
                         sizes: Seq[Int] = Seq(1, 5, 10, 15, 20, 25, 30, 35)): DataFrame = {
    val bad = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand") =!= excludeBrand &&
              col("p_type") =!= excludeType &&
              col("p_size").isin(sizes.map(Integer.valueOf): _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    Tables.lineitem(spark, dir)
      .select("l_partkey", "l_suppkey").distinct()
      .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q18-class large-volume orders: orders whose total quantity
    * exceeds the threshold, with customer identity — top 100 by order
    * price. Quantities are integral so the HAVING gate is exact; the
    * top-K cut orders by INTEGER price cents (then order key), so no
    * float-tie ambiguity reaches the TakeOrdered. One (orderkey)
    * aggregate on the fact, then joins against orders/customer —
    * the pre-aggregate side is order-distinct, far smaller than the
    * fact at every scale.
    */
  def largeQtyOrders(spark: SparkSession, dir: String,
                     minQty: Long = 200L, topK: Int = 100): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    big.join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("o_totalprice"),
            round(col("o_totalprice") * 100).cast("bigint").as("price_cents")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir).select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .orderBy(col("price_cents").desc, col("o_orderkey").asc)
      .limit(topK)
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_date"),
        col("o_totalprice").as("total_price"), col("sum_qty"))
  }

  /** TPC-H Q20-class dominant suppliers, adapted: with no partsupp
    * availqty, Q20's "availqty > half the shipped quantity" becomes
    * "this supplier shipped MORE than 1/denom of the part's total" —
    * the same nested-aggregate-gate shape in EXACT integer quantities
    * (qty_ps·denom > qty_part). The default denom 8 (a 12.5% share,
    * ~12× the uniform 1/|suppliers| expectation on this corpus) fires
    * at every scale factor where Q20's literal 1/2 never does against
    * uniformly-spread synthetic flows. Over the name-prefixed part
    * family, each qualifying supplier reports how many parts it
    * dominates. Two (partkey[, suppkey]) aggregates joined on the
    * part key; part filter and dims broadcast.
    */
  def dominantSuppliers(spark: SparkSession, dir: String,
                        namePrefix: String = "small",
                        shareDenom: Int = 8): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_name").startsWith(namePrefix)).select("p_partkey")
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("bigint").as("qty"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
    val ps = li.groupBy("l_partkey", "l_suppkey")
      .agg(sum(col("qty")).as("q_ps"))
    val pa = li.groupBy("l_partkey").agg(sum(col("qty")).as("q_part"))
      .withColumnRenamed("l_partkey", "a_partkey")
    ps.join(pa, col("l_partkey") === col("a_partkey"))
      .filter(col("q_ps") * shareDenom > col("q_part"))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n_parts_dominated"),
           sum(col("q_ps")).as("qty_shipped"))
      .join(broadcast(Tables.supplier(spark, dir)
          .select("s_suppkey", "s_name", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir).select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_parts_dominated"), col("qty_shipped"))
      .orderBy("s_suppkey")
  }

  /** ABC (Pareto) inventory classification: parts ranked by revenue,
    * class A = the prefix holding ≤80% of cumulative revenue, B the
    * next ≤95%, C the tail. The EXACT global prefix sum is the
    * [[graft.operators.CorpusOps]] global-rank move applied to a
    * running total: range-repartition on the (revenue desc, part)
    * total order, per-partition sums collected once (one bounded
    * driver row per partition) and broadcast back as offsets, the
    * intra-partition cumulative window riding the SAME partitioning
    * — no single-reducer ORDER BY anywhere. Revenue is exact integer
    * revenue-micros (the 4-dp decimal × 10⁶; Σmicro < 2⁶³ holds to a
    * ~$9T corpus — past that, widen the offsets to decimal, same
    * shape); the 80/95 gates are integer cross-multiplications
    * evaluated in DECIMAL(38,0) so cum·100 can never overflow.
    */
  def abcClasses(spark: SparkSession, dir: String): DataFrame = {
    val rev = col("l_extendedprice").cast("decimal(18,6)") *
      (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)"))
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("part"), rev.as("revd"))
      .groupBy("part")
      .agg((sum(col("revd")) * lit(1000000)).cast("long").as("micro"))
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sortCols = Seq(col("micro").desc, col("part").asc)
    val parted = perPart.repartitionByRange(n, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val partSums = parted.groupBy("_pid").agg(sum(col("micro")).as("s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = partSums.map(_._1).zip(partSums.scanLeft(0L)(_ + _._2).init)
    val total = partSums.map(_._2).sum
    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("_pid", "_soff")
    val w = Window.partitionBy("_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val big = (c: Column) => c.cast("decimal(38,0)")
    parted
      .withColumn("_run", sum(col("micro")).over(w))
      .join(broadcast(offsetDf), "_pid")
      .withColumn("cum", col("_soff") + col("_run"))
      .withColumn("abc_class",
        when(big(col("cum")) * 10 <= big(lit(total)) * 8, "A")
          .when(big(col("cum")) * 100 <= big(lit(total)) * 95, "B")
          .otherwise("C"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"),
           round(sum(col("micro")).cast("double") / 1e6, 6).as("revenue"),
           round(sum(col("micro")).cast("double") / total.toDouble, 6)
             .as("revenue_share"))
      .orderBy("abc_class")
  }

  /** Markov conditional entropy of the user event stream: per source
    * event type, H(next | this) = −Σ_y p(y|x)·ln p(y|x) over the
    * SAME transition cells [[transitionMatrix]] normalizes — the
    * predictability reading of that matrix (0 bits = the next event
    * is determined). Each term is one deterministic double from exact
    * integer counts, ROUNDED to 12 and locked into DECIMAL(16,12)
    * before the per-row sum over the bounded cell table (the
    * bigram-ppl discipline — no float summation order anywhere);
    * exits round-6. The marginal share divides exact integers.
    */
  def markovEntropy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(unix_timestamp(col("ts")).asc, col("event_id").asc)
    val cells = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // bounded: |event types|²
    val tot = cells.agg(sum("c").as("n_total"))
    cells
      .withColumn("cx", sum(col("c")).over(Window.partitionBy("from_type")))
      .withColumn("term",
        round((col("c").cast("double") / col("cx")) *
              log(col("cx").cast("double") / col("c")), 12)
          .cast("decimal(16,12)"))
      .groupBy("from_type")
      .agg(sum(col("c")).as("n_out"),
           count(lit(1)).as("n_targets"),
           sum(col("term")).as("h")) // exact decimal sum
      .crossJoin(broadcast(tot))
      .select(col("from_type"), col("n_out"), col("n_targets"),
        round(col("n_out").cast("double") / col("n_total"), 6)
          .as("marginal_share"),
        round(col("h").cast("string").cast("double"), 6).as("cond_entropy"))
      .orderBy("from_type")
  }

  /** l-diversity audit over the customer quasi-identifier
    * (nation, market segment): within each QI group, how many
    * DISTINCT order priorities (the stand-in sensitive attribute)
    * does an attacker face — the re-identification companion of
    * [[kAnonSuppression]]: k-anonymity bounds WHO, l-diversity bounds
    * WHAT. Per nation: group count, worst-group l, and the share of
    * orders sitting in groups below the diversity bar. All exact
    * integer counts off one (QI) aggregate; the QI grid is
    * dims-bounded at any scale.
    */
  def lDiversity(spark: SparkSession, dir: String, l: Int = 3): DataFrame = {
    val cells = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderpriority"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(countDistinct(col("o_orderpriority")).as("l_div"),
           count(lit(1)).as("n_orders"))
    cells.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_groups"),
           min(col("l_div")).as("min_l"),
           sum(when(col("l_div") < l, 1L).otherwise(0L)).as("n_low_diversity"),
           sum(col("n_orders")).as("n_orders_total"),
           sum(when(col("l_div") < l, col("n_orders")).otherwise(0L))
             .as("n_orders_exposed"))
      .join(broadcast(Tables.nation(spark, dir)
        .select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("n_groups"), col("min_l"),
        col("n_low_diversity"),
        round(col("n_orders_exposed").cast("double") / col("n_orders_total"), 6)
          .as("exposed_share"))
      .orderBy("n_name")
  }

  /** AMS sign-sketch audit of the second frequency moment (Alon,
    * Matias & Szegedy 1996): nine independent {-1,+1} hash estimators
    * of F2 = sum(c_u^2) over the user-id frequency vector, the median
    * reported against the exact value with its relative error — the
    * self-join-size sketch graded with the same measure-don't-claim
    * discipline as [[bloomAudit]]/[[hllErrorAudit]]. Signs come from
    * the parity of the same multiply-mod family the Bloom audit uses;
    * every estimator is an exact BIGINT sum, the median picks row 5
    * of a NINE-row window (bounded — documented single-partition
    * sort of 9 rows).
    *
    * Scale shape: one (user_id) count aggregate, a 9x fan-out of the
    * BOUNDED count table, 9-row rollup. Overflow bound: |S| <= total
    * event count, S^2 < 2^63 through ~3e9 events per run.
    */
  def amsF2(spark: SparkSession, dir: String): DataFrame = {
    val P = 1000000007L
    val seeds = Seq((31L, 7L), (131L, 911L), (8191L, 131071L), (37L, 101L),
      (61L, 509L), (127L, 8191L), (211L, 1009L), (331L, 77L), (523L, 13L))
    val counts = Tables.events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val signed = counts.select(col("c"), explode(array(
        seeds.zipWithIndex.map { case ((a, b), i) =>
          struct(lit(i.toLong).as("seed"),
            // pmod, not %: Spark's % returns negative remainders for
            // negative ids, which would corrupt the ±1 sign to -3/-1
            (pmod(pmod(col("user_id") * a + b, lit(P)), lit(2L)) * 2 - 1)
              .as("sgn")) }: _*)).as("e"))
      .select(col("e.seed").as("seed"), (col("e.sgn") * col("c")).as("sc"))
    val med = signed.groupBy("seed").agg(sum(col("sc")).as("s"))
      .select(col("seed"), (col("s") * col("s")).as("est"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("est").asc, col("seed").asc)))
      .filter(col("rn") === 5)
      .select(col("est").as("f2_est"))
    counts.agg(sum(col("c") * col("c")).as("f2_exact"),
        count(lit(1)).as("n_keys"))
      .crossJoin(broadcast(med))
      .select(col("n_keys"), col("f2_exact"), col("f2_est"),
        round(abs(col("f2_est") - col("f2_exact")).cast("double") /
              col("f2_exact").cast("double"), 6).as("rel_err"))
  }

  /** Theil inequality indices per market segment over customer spend
    * (Theil 1967) — the decomposable complements of [[giniSpend]]:
    * `T = (1/n) * sum (x/mu) * ln(x/mu)` (top-sensitive) and
    * `L = (1/n) * sum ln(mu/x)` (bottom-sensitive). Each customer's
    * ln term is micro-unit rounded ONCE (the only transcendental per
    * row — same ln-at-micro discipline as the RA weights), so both
    * indices are exact BIGINT sums with one divide; mu enters each
    * term as the same exact decimal-summed double. Zero-spend
    * customers cannot occur (an order has positive totalprice).
    *
    * Scale shape: one (custkey) aggregate, a broadcast of the
    * segment-bounded totals, one bounded rollup — no global sort,
    * which is exactly why production inequality monitoring prefers
    * Theil over Gini (Gini needs the global rank; Theil is a plain
    * mean of independent per-row terms).
    */
  def theilIndex(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy("o_custkey")
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
      .join(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("cents"))
      .localCheckpoint() // consumers: totals + term projection
    val totals = spend.groupBy("segment")
      .agg(count(lit(1)).as("n"),
           sum(col("cents").cast("decimal(28,0)")).cast("double").as("s"))
      .withColumn("mu", col("s") / col("n").cast("double"))
      .select("segment", "n", "mu")
    spend.join(broadcast(totals), "segment")
      .withColumn("ratio", col("cents").cast("double") / col("mu"))
      .withColumn("t_u", round(col("ratio") * log(col("ratio")) * 1e6)
        .cast("bigint"))
      .withColumn("l_u", round(-log(col("ratio")) * 1e6).cast("bigint"))
      .groupBy("segment")
      .agg(max(col("n")).as("n_customers"),
           sum(col("t_u")).as("st"), sum(col("l_u")).as("sl"))
      .select(col("segment"), col("n_customers"),
        round(col("st").cast("double") / (col("n_customers").cast("double") * 1e6), 6)
          .as("theil_t"),
        round(col("sl").cast("double") / (col("n_customers").cast("double") * 1e6), 6)
          .as("theil_l"))
      .orderBy("segment")
  }

  /** Brown-Forsythe variance-homogeneity test across event types
    * (Brown & Forsythe 1974 — Levene's test with the median center,
    * the robust default): each value's absolute deviation from its
    * GROUP MEDIAN feeds a one-way ANOVA; the F statistic says whether
    * [[Stats.welchT]]'s unequal-variance correction was warranted at
    * all. Group medians are exact order statistics read off the
    * domain-bounded distinct-cent table ([[Stats.kruskalWallis]]'s
    * move — the per-type cumulative window runs over <= |cent
    * domain| rows, never the raw events); the lower median
    * (ceil(n/2)-th value) is the documented convention so the median
    * is always an integer cent and every |x - med| is exact BIGINT.
    * The ANOVA pivots the bounded type universe into literal-ordered
    * terms over exact (n, sum d, sum d^2) triples — the
    * [[Finance.dowAnova]] shape.
    */
  def brownForsythe(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("bigint").as("m"))
    val byVal = ev.groupBy("event_type", "m").agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy("event_type").orderBy(col("m").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("event_type")
    val med = byVal
      .withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("tot", sum(col("c")).over(wAll))
      .withColumn("kth", expr("(tot + 1) DIV 2"))
      .filter(col("cum") - col("c") < col("kth") && col("kth") <= col("cum"))
      .select(col("event_type"), col("m").as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .select(col("event_type"), abs(col("m") - col("med")).as("d"))
    val types = Stats.EventTypes
    val aggs = Seq(count(lit(1)).as("n"),
        sum(col("d")).as("s"),
        sum((col("d") * col("d")).cast("decimal(28,0)")).cast("double").as("q")) ++
      types.flatMap { t =>
        Seq(sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t"),
            sum(when(col("event_type") === t, col("d")).otherwise(lit(0L)))
              .as(s"s_$t"))
      }
    val g = dev.agg(aggs.head, aggs.tail: _*)
    val groupTerm = types.map { t =>
      when(col(s"n_$t") > 0,
        col(s"s_$t").cast("double") * col(s"s_$t").cast("double") /
          col(s"n_$t").cast("double")).otherwise(lit(0.0)) }.reduce(_ + _)
    val k = types.map(t => when(col(s"n_$t") > 0, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val nD = col("n").cast("double")
    val ssb = groupTerm - col("s").cast("double") * col("s").cast("double") / nD
    val ssw = col("q") - groupTerm
    g.filter(col("n") > k && ssw > 0)
      .select(col("n").as("n_events"), (k - lit(1L)).as("df_between"),
        (col("n") - k).as("df_within"),
        round(ssb / (k - lit(1L)).cast("double") /
              (ssw / (col("n") - k).cast("double")), 6).as("f_stat"),
        round(ssb / (ssb + ssw), 6).as("eta_sq"))
  }

  /** Laplace-mechanism UTILITY SIMULATION / accuracy audit (Dwork et
    * al. 2006), NOT a differentially-private release: per
    * (event_type, day) cell, a Laplace(1/eps)-distributed perturbation
    * is added to the true count; the audit reports, per event type,
    * the perturbed total beside the truth and the realized L1 error —
    * what a governance plane uses to SIZE the privacy/utility trade
    * of a real release before making one. It provides zero actual DP:
    * the noise is the inverse-CDF transform of a deterministic PUBLIC
    * per-cell hash uniform (u in (0,1) from
    * `(key*8191+131071) mod P mod 2^20`,
    * noise = -sgn(u-1/2) * ln(1-2|u-1/2|)/eps), so anyone can
    * recompute and subtract it. That determinism is deliberate — it
    * is what makes the error distribution oracle-checkable in two
    * engines; a production release would draw the noise from a
    * secret-seeded CSPRNG and publish only the epsilon. Micro-unit
    * rounded BEFORE aggregation so every error sum is exact BIGINT;
    * the `+1` offset keeps u strictly inside (0,1) — ln never sees 0.
    *
    * Scale shape: one (type, day) aggregate, a narrow noise
    * projection, one bounded rollup. Nothing but cell statistics
    * ever shuffles.
    */
  def dpRelease(spark: SparkSession, dir: String, eps: Double = 1.0): DataFrame = {
    val P = 1000000007L
    val typeIdx = Stats.EventTypes.zipWithIndex
      .foldLeft(lit(-1L)) { case (acc, (t, i)) =>
        when(col("event_type") === t, lit(i.toLong)).otherwise(acc) }
    val cells = Tables.events(spark, dir)
      .select(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"))
      .groupBy("event_type", "day_s")
      .agg(count(lit(1)).as("c"))
      .withColumn("key", col("day_s") + typeIdx)
      .withColumn("t",
        (col("key") * 8191 + 131071) % P % 1048576 + 1)
      .withColumn("u", col("t").cast("double") / 1048577)
      .withColumn("r", lit(1.0) - lit(2.0) * abs(col("u") - lit(0.5)))
      .withColumn("noise_u",
        round(-signum(col("u") - lit(0.5)) * log(col("r")) / eps * 1e6)
          .cast("bigint"))
    cells.groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"),
           sum(col("c")).as("true_total"),
           sum(col("noise_u")).as("net_noise_u"),
           sum(abs(col("noise_u"))).as("l1_u"),
           max(abs(col("noise_u"))).as("max_u"))
      .select(col("event_type"), col("n_cells"), col("true_total"),
        round(col("true_total").cast("double") +
              col("net_noise_u").cast("double") / 1e6, 6).as("released_total"),
        round(col("l1_u").cast("double") / 1e6, 6).as("l1_error"),
        round(col("max_u").cast("double") / 1e6, 6).as("max_abs_error"),
        lit(eps).as("epsilon"))
      .orderBy("event_type")
  }

  /** TPC-H Q6-class forecast-revenue filter scan: the pure
    * predicate-pushdown query — every filter reaches the parquet
    * scan, the aggregate is one decimal sum. The query that proves
    * the scan layer prunes (3 of 11 columns read) and pushes (4
    * range predicates) — at 100 TB this is the difference between
    * reading 3 TB and reading 100.
    */
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)") *
               col("l_discount").cast("decimal(18,6)"))
             .cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
}
