package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical hypothesis-test / rank statistics over the tick stream
  * and the order book — the inferential layer on top of the
  * descriptive moments ([[Analytics.momentsProfile]]) and the
  * domain-specific screens ([[Finance]]). Every statistic follows the
  * repo's engine-exactness discipline:
  *
  *  - ranks are computed as INTEGER doubled average ranks
  *    (`2*rank + tie_count - 1` — the classic trick that keeps
  *    half-integer average ranks in exact BIGINT arithmetic),
  *  - sums/moments aggregate integers (cents, doubled ranks), never
  *    doubles, so no engine can diverge on summation order,
  *  - the final test statistic is ONE fixed-shape double expression
  *    over those exact integers (identical IEEE ops in Spark and
  *    DuckDB), rounded to 6 places,
  *  - when a statistic is an inherently multi-term double sum
  *    (chi-square cell terms, EMD positions), each term is rounded to
  *    micro-units and summed as BIGINT — the [[TextAnalysis]]
  *    decimal-summed-nll discipline.
  *
  * Scale shape: Spearman / Mann-Whitney rank windows partition by
  * symbol / user (never a global single-reducer window); Welch and
  * chi-square reduce to category-count-bounded aggregates joined
  * broadcast; t-closeness fans each QI cell out over a fixed 10-band
  * grid (linear in cells). Extends the reference's analytics surface
  * (financial_engine.py has only the SMA at :293-312) with the
  * published test formulas: Spearman 1904, Mann & Whitney 1947,
  * Welch 1947, Cramér 1946, Li et al. 2007 (t-closeness).
  */
object Stats {

  /** Integer doubled average rank of `src` within `part`:
    * `2*RANK() + peer_count - 1` = twice the average (fractional)
    * rank, exact in BIGINT. The peer count rides the SAME partition
    * exchange as the rank (RANGE CURRENT ROW..CURRENT ROW frame).
    */
  private def doubledRank(part: String, src: String): Column = {
    val ord = Window.partitionBy(part).orderBy(col(src).asc)
    val peers = Window.partitionBy(part).orderBy(col(src).asc).rangeBetween(0, 0)
    lit(2L) * rank().over(ord).cast("long") +
      count(lit(1)).over(peers) - lit(1L)
  }

  /** Per-symbol Spearman rank correlation between tick price and tick
    * volume. Both variables are ranked with integer doubled average
    * ranks (ties get the exact average position); Pearson's formula
    * then runs entirely on BIGINT sums —
    * `rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2))`
    * — with one double divide+sqrt at the end. Affine invariance of
    * correlation makes the doubled ranks give exactly Spearman's rho.
    *
    * Exactness bound: doubled ranks are <= 2n, so the largest moment
    * `n*Sxy <= 4*n^4` stays in BIGINT for per-symbol tick counts up
    * to ~1.2M; beyond that the moments need DECIMAL(38) widening
    * (symbol counts grow with corpus scale, per-symbol depth does
    * not — the amplifier re-keys symbols, matching production
    * sharding). Constant-price or constant-volume symbols
    * (zero-variance ranks) drop on both engines.
    *
    * One (symbol) exchange serves both rank windows, both peer
    * counts, and the final aggregation.
    */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    Finance.quotes(spark, dir)
      .filter(col("volume").isNotNull)
      .withColumn("m", round(col("price") * 100).cast("bigint"))
      .withColumn("dx", doubledRank("symbol", "m"))
      .withColumn("dy", doubledRank("symbol", "volume"))
      .groupBy("symbol")
      .agg(count(lit(1)).as("n"),
           sum(col("dx")).as("sx"), sum(col("dy")).as("sy"),
           sum(col("dx") * col("dx")).as("sxx"),
           sum(col("dy") * col("dy")).as("syy"),
           sum(col("dx") * col("dy")).as("sxy"))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .filter(col("n") >= 3 && col("vx") > 0 && col("vy") > 0)
      .select(col("symbol"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt(col("vx").cast("double") * col("vy").cast("double")), 6)
          .as("rho"))
      .orderBy("symbol")
  }

  /** [[spearman]] from its sufficient statistic — the per-symbol
    * joint (cent, volume) histogram. Doubled average ranks are
    * rebuilt from the count-weighted marginals (dr = 2*(cum−c) + c + 1
    * over the domain-bounded distinct-value table — identical
    * integers to the per-row ranks: positions cum−c+1..cum average to
    * that), and the rank moments are count-weighted BIGINT sums, so
    * rho matches the batch operator bit-for-bit. Counts are additive
    * across splits: the streaming twin
    * ([[graft.streaming.StreamingStats.spearman]]) folds stored
    * per-batch cell counts through this same function.
    */
  private[graft] def spearmanFromCells(cells: DataFrame): DataFrame = {
    def drTab(src: String): DataFrame = {
      val w = Window.partitionBy("symbol").orderBy(col(src).asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      cells.groupBy("symbol", src).agg(sum(col("cnt")).as("c"))
        .withColumn("cum", sum(col("c")).over(w))
        .select(col("symbol"), col(src),
          (lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L)).as(s"dr_$src"))
    }
    cells
      .join(drTab("m"), Seq("symbol", "m"))
      .join(drTab("v"), Seq("symbol", "v"))
      .groupBy("symbol")
      .agg(sum(col("cnt")).as("n"),
           sum(col("cnt") * col("dr_m")).as("sx"),
           sum(col("cnt") * col("dr_v")).as("sy"),
           sum(col("cnt") * col("dr_m") * col("dr_m")).as("sxx"),
           sum(col("cnt") * col("dr_v") * col("dr_v")).as("syy"),
           sum(col("cnt") * col("dr_m") * col("dr_v")).as("sxy"))
      .withColumn("vx", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("vy", col("n") * col("syy") - col("sy") * col("sy"))
      .filter(col("n") >= 3 && col("vx") > 0 && col("vy") > 0)
      .select(col("symbol"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              sqrt(col("vx").cast("double") * col("vy").cast("double")), 6)
          .as("rho"))
      .orderBy("symbol")
  }

  /** Per-user Mann-Whitney U test: do `purchase` event values
    * stochastically dominate `view` values for this user? Ranks both
    * samples jointly per user with doubled average ranks; U comes
    * from the doubled rank-sum identity `2*U1 = 2*R1 - n1*(n1+1)*... `
    * kept doubled (exact BIGINT) until one final halving. The normal
    * approximation's z uses the standard tie-corrected variance
    * `sigma^2 = n1*n2/12 * ((n+1) - T/(n*(n-1)))` with
    * `T = sum(t^3 - t)` over tie groups — T aggregates the identity
    * `sum_rows(peer^2 - 1) = sum_groups(t^3 - t)`, all BIGINT. No
    * continuity correction (documented choice; both engines agree by
    * construction). Users need >= 5 samples on each side and a
    * positive variance.
    *
    * Scale shape: the rank window partitions by user — embarrassingly
    * parallel across users, no global rank anywhere.
    */
  def mannWhitney(spark: SparkSession, dir: String,
                  typeA: String = "purchase", typeB: String = "view"): DataFrame = {
    val base = Tables.events(spark, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("bigint").as("m"))
    val peers = Window.partitionBy("user_id").orderBy(col("m").asc).rangeBetween(0, 0)
    val ranked = base
      .withColumn("dr", doubledRank("user_id", "m"))
      .withColumn("peer", count(lit(1)).over(peers))
    ranked
      .groupBy("user_id")
      .agg(
        sum(when(col("event_type") === typeA, lit(1L)).otherwise(lit(0L))).as("n1"),
        sum(when(col("event_type") === typeB, lit(1L)).otherwise(lit(0L))).as("n2"),
        sum(when(col("event_type") === typeA, col("dr")).otherwise(lit(0L))).as("r1x2"),
        sum(col("peer") * col("peer") - lit(1L)).as("tsum"))
      .filter(col("n1") >= 5 && col("n2") >= 5)
      .withColumn("u2x", col("r1x2") - col("n1") * (col("n1") + lit(1L)))
      .withColumn("nn", col("n1") + col("n2"))
      .withColumn("sig2",
        col("n1").cast("double") * col("n2").cast("double") / lit(12.0) *
          ((col("nn") + lit(1L)).cast("double") -
           col("tsum").cast("double") /
             (col("nn").cast("double") * (col("nn") - lit(1L)).cast("double"))))
      .filter(col("sig2") > 0)
      .select(col("user_id"), col("n1"), col("n2"),
        round(col("u2x").cast("double") / 2, 6).as("u_stat"),
        round((col("u2x").cast("double") / 2 -
               col("n1").cast("double") * col("n2").cast("double") / 2) /
              sqrt(col("sig2")), 6).as("z_score"))
      .orderBy("user_id")
  }

  /** Welch's unequal-variance t-test between every pair of event
    * types on event value. Per-type sufficient statistics (n, sum m,
    * sum m^2 over integer cents) aggregate as DECIMAL — overflow-safe
    * at any corpus scale — then ONE fixed double expression computes
    * mean, sample variance, Welch's t, and the Welch-Satterthwaite
    * degrees of freedom per ordered pair. The pair join runs on the
    * category-count-bounded aggregate (5 rows here) — broadcast by
    * size, never a shuffle of the raw table.
    */
  def welchT(spark: SparkSession, dir: String): DataFrame =
    welchFromStats(
      Tables.events(spark, dir)
        .withColumn("m", round(col("value") * 100).cast("bigint"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
             sum(col("m").cast("decimal(28,0)")).as("s1"),
             sum((col("m") * col("m")).cast("decimal(28,0)")).as("s2")))

  /** The Welch pair table from per-type sufficient statistics
    * `(event_type, n, s1 DECIMAL, s2 DECIMAL)` — shared verbatim by
    * the batch query and the streamed-store fold
    * ([[graft.streaming.StreamingStats]]), so stream==batch is
    * algebra (decimal sums are split- and order-independent), not
    * luck. */
  private[graft] def welchFromStats(raw: DataFrame): DataFrame = {
    val stats = raw
      .select(col("event_type"), col("n"),
        col("s1").cast("double").as("s1"), col("s2").cast("double").as("s2"))
      .filter(col("n") >= 2)
      .withColumn("mean", col("s1") / col("n").cast("double") / 100)
      .withColumn("v",
        (col("s2") - col("s1") * col("s1") / col("n").cast("double")) /
          (col("n") - lit(1L)).cast("double") / 10000)
    val a = stats.select(col("event_type").as("type_a"), col("n").as("na"),
      col("mean").as("ma"), col("v").as("va"))
    val b = stats.select(col("event_type").as("type_b"), col("n").as("nb"),
      col("mean").as("mb"), col("v").as("vb"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .withColumn("sea", col("va") / col("na").cast("double"))
      .withColumn("seb", col("vb") / col("nb").cast("double"))
      .filter(col("sea") + col("seb") > 0)
      .select(col("type_a"), col("type_b"), col("na"), col("nb"),
        round((col("ma") - col("mb")) / sqrt(col("sea") + col("seb")), 6)
          .as("t_stat"),
        round((col("sea") + col("seb")) * (col("sea") + col("seb")) /
              (col("sea") * col("sea") / (col("na") - lit(1L)).cast("double") +
               col("seb") * col("seb") / (col("nb") - lit(1L)).cast("double")), 6)
          .as("df"))
      .orderBy("type_a", "type_b")
  }

  /** Chi-square independence test (+ Cramér's V) on the order
    * priority x order status contingency table. Observed counts are
    * exact; each cell's `(o-e)^2/e` term is computed in double from
    * exact counts (e = row_total*col_total/N), rounded to micro-units,
    * and summed as BIGINT — the micro-unit discipline that makes the
    * multi-term sum engine-exact regardless of cell order. Marginals
    * join broadcast (category-count-bounded). Output: one row — chi2,
    * degrees of freedom, Cramér's V, N.
    */
  def chiSquare(spark: SparkSession, dir: String): DataFrame =
    chiFromCells(
      Tables.orders(spark, dir)
        .groupBy(col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("o")))

  /** Chi-square + Cramér's V from a contingency table
    * `(pri, st, o)` — shared by the batch query and the streamed
    * cell-count store ([[graft.streaming.StreamingStats]]); integer
    * cell counts merge exactly across micro-batches. */
  private[graft] def chiFromCells(cells: DataFrame): DataFrame = {
    val cellsC = cells.localCheckpoint()
    val rowT = cellsC.groupBy("pri").agg(sum(col("o")).as("rt"))
    val colT = cellsC.groupBy("st").agg(sum(col("o")).as("ct"))
    val tot = cellsC.agg(sum(col("o")).as("n_total"),
      countDistinct(col("pri")).as("r"), countDistinct(col("st")).as("c"))
    cellsC
      .join(broadcast(rowT), "pri")
      .join(broadcast(colT), "st")
      .crossJoin(broadcast(tot))
      .withColumn("e", col("rt").cast("double") * col("ct").cast("double") /
        col("n_total").cast("double"))
      .withColumn("term_u",
        round((col("o").cast("double") - col("e")) *
              (col("o").cast("double") - col("e")) / col("e") * 1e6)
          .cast("bigint"))
      .groupBy("n_total", "r", "c")
      .agg(sum(col("term_u")).as("chi_u"))
      .select(
        col("n_total"),
        round(col("chi_u").cast("double") / 1e6, 6).as("chi2"),
        ((col("r") - 1) * (col("c") - 1)).as("df"),
        round(sqrt(col("chi_u").cast("double") / 1e6 /
          (col("n_total").cast("double") *
           least(col("r") - 1, col("c") - 1).cast("double"))), 6)
          .as("cramers_v"))
  }

  /** Chatterjee's xi rank correlation (Chatterjee 2020, JASA) per
    * symbol — price vs volume: does volume move as a FUNCTION of
    * price level, monotone or not? xi is the modern dependence
    * coefficient that detects ANY functional relationship where
    * Spearman ([[spearman]]) sees only monotone ones; it converges to
    * 0 under independence and 1 when volume is a measurable function
    * of price. The tie-robust form:
    * `xi = 1 - n * sum|r_{i+1} - r_i| / (2 * sum l_i*(n - l_i))`
    * over rows ordered by (price, id), with r_i = #{v_j <= v_i}
    * (max-tie rank = rank + peers - 1) and l_i = #{v_j >= v_i}
    * (n - min_rank + 1) — every term exact BIGINT from the same
    * one-(symbol)-exchange rank windows as Spearman. Constant-volume
    * symbols (zero denominator) drop on both engines.
    */
  def xiCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val rnkV = Window.partitionBy("symbol").orderBy(col("v").asc)
    val peers = Window.partitionBy("symbol").orderBy(col("v").asc).rangeBetween(0, 0)
    val byX = Window.partitionBy("symbol").orderBy(col("m").asc, col("id").asc)
    val full = Window.partitionBy("symbol")
    Finance.quotes(spark, dir)
      .filter(col("volume").isNotNull)
      .select(col("symbol"), col("id"),
        round(col("price") * 100).cast("bigint").as("m"),
        col("volume").as("v"))
      .withColumn("nn", count(lit(1)).over(full))
      .withColumn("r", rank().over(rnkV).cast("long") +
        count(lit(1)).over(peers) - lit(1L))
      .withColumn("l", col("nn") - rank().over(rnkV).cast("long") + lit(1L))
      .withColumn("dr", abs(col("r") - lag(col("r"), 1).over(byX)))
      .groupBy("symbol")
      .agg(max(col("nn")).as("n"),
           sum(col("dr")).as("sdr"),
           sum(col("l") * (col("nn") - col("l"))).as("sl"))
      .filter(col("n") >= 3 && col("sl") > 0)
      .select(col("symbol"), col("n"),
        round(lit(1.0) - (col("n") * col("sdr")).cast("double") /
              (lit(2.0) * col("sl").cast("double")), 6).as("xi"))
      .orderBy("symbol")
  }

  /** Wald-Wolfowitz runs test per symbol on tick move signs: is the
    * up/down direction sequence random, or does it trend/mean-revert
    * (Wald & Wolfowitz 1940)? Zero moves drop (the tick-rule
    * convention); R = observed runs via the gaps-and-islands sign
    * change count ([[Finance.directionStreaks]]'s primitive), and z
    * compares R against the exact randomization moments
    * `mu = 2*np*nm/n + 1`,
    * `sigma^2 = 2*np*nm*(2*np*nm - n)/(n^2*(n-1))` — all from three
    * BIGINTs (np, nm, R) in one fixed double expression. Negative z
    * = fewer runs than chance (trending); positive = more
    * (mean-reverting) — the nonparametric cousin of
    * [[Finance.acfProfile]]'s lag-1 sign.
    */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val ord = Window.partitionBy("symbol").orderBy(col("ts_epoch").asc, col("id").asc)
    val signs = Finance.quotes(spark, dir)
      .withColumn("m", round(col("price") * 100).cast("bigint"))
      .withColumn("d", col("m") - lag(col("m"), 1).over(ord))
      .filter(col("d").isNotNull && col("d") =!= 0)
      .withColumn("sgn", when(col("d") > 0, lit(1L)).otherwise(lit(-1L)))
      .withColumn("chg",
        when(lag(col("sgn"), 1).over(ord).isNull, lit(0L))
          .when(col("sgn") =!= lag(col("sgn"), 1).over(ord), lit(1L))
          .otherwise(lit(0L)))
    val g = signs.groupBy("symbol")
      .agg(sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("np"),
           sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("nm"),
           (sum(col("chg")) + lit(1L)).as("r_runs"))
      .withColumn("n", col("np") + col("nm"))
      .filter(col("np") > 0 && col("nm") > 0 && col("n") >= 3)
    val nD = col("n").cast("double")
    val p2 = lit(2.0) * col("np").cast("double") * col("nm").cast("double")
    val mu = p2 / nD + 1
    val sig2 = p2 * (p2 - nD) / (nD * nD * (nD - 1))
    g.filter(p2 * (p2 - nD) > 0)
      .select(col("symbol"), col("n").as("n_moves"), col("r_runs"),
        round(mu, 6).as("expected_runs"),
        round((col("r_runs").cast("double") - mu) / sqrt(sig2), 6).as("z_score"))
      .orderBy("symbol")
  }

  /** Literal event-type universe for the pivoted rank tests — the
    * bounded-category contract the corpus generator publishes (the
    * [[Finance.dowAnova]] weekday-pivot move: folding a bounded
    * category into literal-ordered expression terms is what keeps a
    * multi-group statistic free of cross-row double summation). */
  private[graft] val EventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** Kruskal-Wallis H test: do the five event types draw their values
    * from the same distribution? GLOBAL doubled average ranks are
    * derived per DISTINCT cent value — the cent domain is bounded
    * (~49k values at any corpus scale), so the prefix-sum window runs
    * over a domain-bounded table, never the raw rows (documented
    * single-partition window over <= |cent domain| rows; the raw-row
    * global window this replaces is the 100 TB anti-pattern). Ranks
    * join back BROADCAST; per-type rank sums pivot into ONE row of
    * literal-ordered terms ([[EventTypes]]), so H — including the
    * tie-corrected denominator `1 - sum(t^3-t)/(N^3-N)` — is a single
    * fixed double expression over exact BIGINT/DECIMAL sums.
    */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame =
    kruskalFromCounts(Tables.events(spark, dir)
      .select(col("event_type"), round(col("value") * 100).cast("bigint").as("m"))
      .groupBy("event_type", "m").agg(count(lit(1)).as("cj")))

  /** [[kruskalWallis]] from its sufficient statistic — the
    * (event_type, cent) count table. The counts are additive across
    * splits, so the streaming twin
    * ([[graft.streaming.StreamingStats.kruskalWallis]]) folds stored
    * per-batch partials through this same function and reproduces the
    * batch H exactly.
    */
  private[graft] def kruskalFromCounts(perType: DataFrame): DataFrame = {
    val d19 = "decimal(19,0)"; val d38 = "decimal(38,0)"
    val byVal = perType.groupBy("m").agg(sum(col("cj")).as("c")).localCheckpoint()
    val wOrd = Window.orderBy(col("m").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val ranked = byVal
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("dr", lit(2L) * (col("cum") - col("c")) + col("c") + lit(1L))
    val joined = perType.join(broadcast(ranked.select("m", "dr")), "m")
    val aggCols = sum(col("cj")).as("n_total") +:
      EventTypes.flatMap { t =>
        Seq(sum(when(col("event_type") === t, col("cj")).otherwise(lit(0L)))
              .as(s"n_$t"),
            // cast INSIDE the sum so the ~2N^2 accumulation runs in
            // decimal, not BIGINT (overflows ~N=2.1e9 events); the
            // outer d19 keeps the pivoted column type unchanged
            sum(when(col("event_type") === t,
                  (col("cj").cast(d19) * col("dr").cast(d19)).cast(d38))
              .otherwise(lit(0L).cast(d38))).cast(d19).as(s"r2_$t"))
      }
    val pivoted = joined.agg(aggCols.head, aggCols.tail: _*)
    val ties = byVal.agg(
      sum(((col("c") * col("c")).cast(d19) * col("c").cast(d19)).cast(d38))
        .cast(d38).as("c3"),
      sum(col("c")).cast(d19).as("csum"))
    val nD = col("n_total").cast("double")
    // sum R_j^2/n_j with doubled ranks: (r2/2)^2/n = r2^2/(4n),
    // literal-ordered over the bounded type universe
    val rterm = EventTypes.map { t =>
      when(col(s"n_$t") > 0,
        col(s"r2_$t").cast("double") * col(s"r2_$t").cast("double") /
          (lit(4.0) * col(s"n_$t").cast("double")))
        .otherwise(lit(0.0)) }.reduce(_ + _)
    val k = EventTypes.map(t => when(col(s"n_$t") > 0, lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val tieT = col("c3").cast("double") - col("csum").cast("double")
    val h0 = lit(12.0) / (nD * (nD + 1)) * rterm - lit(3.0) * (nD + 1)
    pivoted.crossJoin(broadcast(ties))
      .filter(col("n_total") >= 2 && tieT < nD * nD * nD - nD)
      .select(col("n_total"), (k - lit(1L)).as("df"),
        round(h0 / (lit(1.0) - tieT / (nD * nD * nD - nD)), 6).as("h_stat"))
  }

  /** t-closeness audit (Li et al. 2007) of the [[Analytics
    * .kAnonSuppression]] quasi-identifier cells (event_type, hour):
    * for each cell, the Earth Mover's Distance between the cell's
    * distribution over 10 ordered value bands and the global
    * distribution — for ordered categories, EMD = mean |cumulative
    * difference|. Every cell fans out over the fixed 10-band grid
    * (absent bands count 0 — their positions still carry the running
    * cumulative), cumulative differences are exact double ratios of
    * BIGINT counts, each position's |diff| is micro-unit rounded and
    * integer-summed (engine-exact), and the per-event-type rollup
    * reports worst/mean EMD and the count of cells violating
    * t = 0.2 — integer sums again, so even the mean is exact.
    *
    * Scale shape: cells x 10 rows, one (cell) window over 10 rows,
    * one bounded rollup. The global band table is 10 rows, broadcast.
    */
  def tCloseness(spark: SparkSession, dir: String, t: Double = 0.2): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        (unix_timestamp(date_trunc("hour", col("ts")))).as("hour_s"),
        least(floor(round(col("value") * 100).cast("bigint") / lit(5000)),
          lit(9L)).as("band"))
    val evC = ev.localCheckpoint()
    val global = evC.groupBy("band").agg(count(lit(1)).as("g"))
    val cellBand = evC.groupBy("event_type", "hour_s", "band")
      .agg(count(lit(1)).as("cb"))
    val grid = cellBand.groupBy("event_type", "hour_s")
      .agg(sum(col("cb")).as("n_cell"))
      .withColumn("band", explode(sequence(lit(0L), lit(9L))))
    val nTotal = evC.agg(sum(lit(1L)).as("n_total"))
    val cum = Window.partitionBy("event_type", "hour_s").orderBy(col("band").asc)
    val emd = grid
      .join(cellBand, Seq("event_type", "hour_s", "band"), "left")
      .join(broadcast(global), Seq("band"), "left")
      .crossJoin(broadcast(nTotal))
      .withColumn("cum_c", sum(coalesce(col("cb"), lit(0L))).over(cum))
      .withColumn("cum_g", sum(coalesce(col("g"), lit(0L))).over(cum))
      .filter(col("band") <= 8)
      .withColumn("d_u",
        round(abs(col("cum_c").cast("double") / col("n_cell").cast("double") -
                  col("cum_g").cast("double") / col("n_total").cast("double")) * 1e9)
          .cast("bigint"))
      .groupBy("event_type", "hour_s")
      .agg(sum(col("d_u")).as("emd_u"))
    emd.groupBy("event_type")
      .agg(count(lit(1)).as("n_cells"),
           round(max(col("emd_u")).cast("double") / 9e9, 6).as("max_emd"),
           round(sum(col("emd_u")).cast("double") / 9e9 /
                 count(lit(1)).cast("double"), 6).as("mean_emd"),
           sum(when(col("emd_u").cast("double") / 9e9 > t, lit(1L))
             .otherwise(lit(0L))).as("n_violations"))
      .orderBy("event_type")
  }

  /** Per-symbol Kendall tau-b between daily close and daily volume —
    * the rank correlation robust to the tie structure Spearman's rho
    * only corrects on average (tau-b's denominator removes tied pairs
    * on each margin exactly). The concordance statistic
    * `S = sum over day pairs of sign(m2-m1)*sign(v2-v1)` is computed
    * from the EXPLICIT day-pair join: per-symbol day counts are
    * corpus-bounded (per-symbol depth does not grow with corpus scale
    * — the amplifier re-keys symbols, matching production sharding),
    * so the pair fan-out is days^2/2 per symbol, embarrassingly
    * parallel across symbols, never corpus-quadratic. Tie corrections
    * n1/n2 come from the per-value histograms (`t*(t-1) div 2`,
    * BIGINT), `n0 = n*(n-1) div 2`, and
    * `tau_b = S / sqrt((n0-n1)*(n0-n2))`.
    *
    * Exactness: everything is integer until the one final
    * divide+sqrt; the denominator product stays below 2^53 (exact in
    * double) for any per-symbol history under ~13.7k days (37 years
    * daily) — documented bound, same class as Spearman's moment
    * bound.
    */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    val q = Finance.quotes(spark, dir)
      .filter(col("volume").isNotNull)
      .withColumn("day", to_date(col("ts")))
    // daily close by last tick order (ts, id) + daily volume — the
    // ohlcBars rn trick, one (symbol, day) exchange
    val w = Window.partitionBy("symbol", "day")
      .orderBy(col("ts_epoch").desc, col("id").desc)
    val daily = q.withColumn("rn_d", row_number().over(w))
      .groupBy("symbol", "day")
      .agg(round(max(when(col("rn_d") === 1, col("price"))) * 100)
             .cast("bigint").as("m"),
           sum(col("volume")).as("v"))
    kendallFromDaily(daily)
  }

  /** [[kendallTau]] from the per-symbol daily table `(symbol, day, m,
    * v)` — the spec seam for literal fixtures, and the fold point a
    * streaming twin would re-derive from a stored daily-bar state.
    */
  private[graft] def kendallFromDaily(daily: DataFrame): DataFrame = {
    val d = daily.localCheckpoint() // pair join + three aggregates read it
    val pairs = d.alias("x").join(d.alias("y"),
        col("x.symbol") === col("y.symbol") && col("x.day") < col("y.day"))
      .select(col("x.symbol").as("symbol"),
        (signum((col("y.m") - col("x.m")).cast("double")) *
         signum((col("y.v") - col("x.v")).cast("double"))).cast("bigint").as("s"))
    val sAgg = pairs.groupBy("symbol").agg(sum(col("s")).as("s_stat"))
    val nTab = d.groupBy("symbol").agg(count(lit(1)).as("n_days"))
    def tieSum(src: String, out: String) =
      d.groupBy(col("symbol"), col(src)).agg(count(lit(1)).as("c"))
        .groupBy("symbol")
        .agg(sum(expr("c * (c - 1) div 2")).as(out))
    nTab.join(sAgg, Seq("symbol"))
      .join(tieSum("m", "n1"), Seq("symbol"))
      .join(tieSum("v", "n2"), Seq("symbol"))
      .withColumn("n0", expr("n_days * (n_days - 1) div 2"))
      .withColumn("den", (col("n0") - col("n1")) * (col("n0") - col("n2")))
      .filter(col("n_days") >= 2 && col("den") > 0)
      .select(col("symbol"), col("n_days"), col("s_stat"),
        round(col("s_stat").cast("double") /
              sqrt(col("den").cast("double")), 6).as("tau_b"))
      .orderBy("symbol")
  }
}
