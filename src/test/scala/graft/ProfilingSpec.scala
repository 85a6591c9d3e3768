package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.Analytics
import graft.functions.PolyHash

/** Segmentation + profiling family: conservation invariants on the
  * driver corpus and the no-single-reducer plan shapes.
  */
class ProfilingSpec extends SparkSuite {

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("RFM: every banded customer accounted for, bands within [1, k]") {
    val seg = Analytics.rfmSegments(spark, sfDir).cache()
    try {
      val custs = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
      assert(seg.agg(sum("n_customers")).head.getLong(0) === custs)
      assert(seg.agg(sum("total_orders")).head.getLong(0) ===
        Tables.orders(spark, sfDir).count())
      val bad = seg.filter(
        col("r_band") < 1 || col("r_band") > 4 ||
        col("f_band") < 1 || col("f_band") > 4 ||
        col("m_band") < 1 || col("m_band") > 4).count()
      assert(bad === 0)
    } finally seg.unpersist()
  }

  test("RFM plan: banding never funnels through one reducer") {
    // the distributed-rank helper uses range partitioning + a window
    // keyed by partition id — a global ROW_NUMBER would show a
    // SinglePartition exchange feeding a Window over the customer set
    val plan = formatted(Analytics.rfmSegments(spark, sfDir))
    val winIdx = plan.linesIterator.zipWithIndex
      .filter(_._1.contains("Window (")).map(_._2).toSeq
    assert(winIdx.nonEmpty, plan)
    assert(!plan.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"global-window single partition found:\n$plan")
  }

  test("attribution: one row per purchasing user, 'none' only for stream-opening purchases") {
    val att = Analytics.lastTouchAttribution(spark, sfDir).cache()
    try {
      val purchasers = Tables.events(spark, sfDir)
        .filter(col("event_type") === "purchase")
        .select("user_id").distinct().count()
      assert(att.agg(sum("n_users")).head.getLong(0) === purchasers)
      val types = Tables.events(spark, sfDir)
        .select("event_type").distinct().collect().map(_.getString(0)).toSet + "none"
      val bad = att.collect().map(_.getString(0)).filterNot(types.contains)
      assert(bad.isEmpty, bad.mkString(","))
    } finally att.unpersist()
  }

  test("profile: 7 columns, counts conserved, distincts bounded by presents") {
    val p = Analytics.columnProfile(spark, sfDir).cache()
    try {
      assert(p.count() === 7)
      val n = Tables.lineitem(spark, sfDir).count()
      assert(p.filter(col("n_rows") =!= n).count() === 0)
      assert(p.filter(col("n_present") > col("n_rows") ||
                      col("n_distinct") > col("n_present") ||
                      col("min_v") > col("max_v")).count() === 0)
      // spot-check one column against a direct computation
      val flag = p.filter(col("col_name") === "l_returnflag").head()
      val direct = Tables.lineitem(spark, sfDir)
        .agg(countDistinct("l_returnflag"), min("l_returnflag"), max("l_returnflag")).head()
      assert(flag.getAs[Long]("n_distinct") === direct.getLong(0))
      assert(flag.getAs[String]("min_v") === direct.getString(1))
      assert(flag.getAs[String]("max_v") === direct.getString(2))
    } finally p.unpersist()
  }

  test("profile plan: the unpivot is a narrow map — no join, first shuffle is the grouped profile") {
    val plan = formatted(Analytics.columnProfile(spark, sfDir))
    assert(!plan.contains("Join"), plan)
    // expand (exact-distinct rewrite) + two-phase agg + output sort:
    // at most 3 exchanges, none SinglePartition
    assert(plan.linesIterator.count(_.contains("Exchange (")) <= 3, plan)
  }

  test("Gini: bounded in [0,1), every ordering customer banded, no per-segment single reducer") {
    val g = Analytics.giniSpend(spark, sfDir)
    val plan = formatted(g)
    assert(!plan.contains("Exchange SinglePartition, ENSURE_REQUIREMENTS"),
      s"per-segment window funneled through one reducer:\n$plan")
    val rows = g.collect()
    assert(rows.forall(r => r.getAs[Double]("gini") >= 0.0 &&
                            r.getAs[Double]("gini") < 1.0))
    assert(rows.map(_.getAs[Long]("n_customers")).sum ===
      Tables.orders(spark, sfDir).select("o_custkey").distinct().count())
  }

  test("mutual information: non-negative and bounded by both marginal entropies") {
    val r = Analytics.mutualInfo(spark, sfDir).head()
    val (mi, hx, hy) = (r.getAs[Double]("mi"), r.getAs[Double]("h_type"),
      r.getAs[Double]("h_band"))
    assert(mi >= -1e-6, s"mi $mi")
    assert(mi <= math.min(hx, hy) + 1e-6, s"mi $mi vs h($hx, $hy)")
    assert(hx > 0 && hy > 0)
  }

  test("ship delay: ordered percentiles, delays bounded by min/max, all lines accounted") {
    val d = Analytics.shipDelay(spark, sfDir).collect()
    assert(d.map(_.getAs[Long]("n_lines")).sum ===
      Tables.lineitem(spark, sfDir).count())
    d.foreach { r =>
      assert(r.getAs[Long]("min_delay") <= r.getAs[Double]("p50_delay"))
      assert(r.getAs[Double]("p50_delay") <= r.getAs[Long]("max_delay"))
      assert(r.getAs[Double]("mean_delay") >= r.getAs[Long]("min_delay"))
      assert(r.getAs[Double]("mean_delay") <= r.getAs[Long]("max_delay"))
    }
  }

  test("funnel timing: lags within the funnel window, user counts match the funnel steps") {
    val t = Analytics.funnelTiming(spark, sfDir).collect()
      .map(r => r.getAs[String]("step") -> r).toMap
    val funnel = Analytics.eventFunnel(spark, sfDir).collect()
      .map(r => r.getAs[String]("step") -> r.getAs[Long]("n_users")).toMap
    assert(t("signup_to_click").getAs[Long]("n_users") === funnel("click_after_signup"))
    assert(t("click_to_purchase").getAs[Long]("n_users") === funnel("purchase_after_click"))
    t.values.foreach { r =>
      val mean = r.getAs[Double]("mean_lag_s")
      val p50  = r.getAs[Double]("p50_lag_s")
      assert(mean >= 0 && mean <= 24 * 3600, mean.toString)
      assert(p50 >= 0 && p50 <= 24 * 3600, p50.toString)
    }
  }

  test("transition matrix: rows are probability distributions, transitions conserved") {
    val t = Analytics.transitionMatrix(spark, sfDir).collect()
    val byFrom = t.groupBy(_.getAs[String]("from_type"))
    byFrom.values.foreach { rows =>
      val mass = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(mass - 1.0) < 1e-4, s"row mass $mass")
    }
    // one transition per event beyond each user's last
    val events = Tables.events(spark, sfDir).count()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(t.map(_.getAs[Long]("n_transitions")).sum === events - users)
  }

  test("reorder gaps: one gap per order beyond each customer's first, ordered stats") {
    val g = Analytics.reorderIntervals(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir).count()
    val customers = Tables.orders(spark, sfDir).select("o_custkey").distinct().count()
    assert(g.map(_.getAs[Long]("n_gaps")).sum === orders - customers)
    g.foreach { r =>
      assert(r.getAs[Long]("min_gap") >= 0)
      assert(r.getAs[Long]("min_gap") <= r.getAs[Double]("p50_gap"))
      assert(r.getAs[Double]("p50_gap") <= r.getAs[Long]("max_gap"))
    }
  }

  test("skyline: members mutually non-dominated, everyone else dominated by some member") {
    val fm = Tables.orders(spark, sfDir).groupBy("o_custkey")
      .agg(count(lit(1)).as("freq"),
           sum(round(col("o_totalprice") * 100).cast("bigint")).as("spend_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sky = Analytics.customerSkyline(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sky.nonEmpty)
    def dominates(a: (Long, Long, Long), b: (Long, Long, Long)) =
      a._2 >= b._2 && a._3 >= b._3 && (a._2 > b._2 || a._3 > b._3)
    for (s <- sky; o <- fm if o._1 != s._1)
      assert(!dominates(o, s), s"$o dominates skyline member $s")
    val skySet = sky.map(_._1).toSet
    for (o <- fm if !skySet.contains(o._1))
      assert(sky.exists(s => dominates(s, o)), s"$o undominated but not on frontier")
  }

  test("weighted sample: acceptance bounded, quality-monotone in aggregate") {
    val w = graft.operators.CorpusOps.weightedSample(spark, sfDir).collect()
    assert(w.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sfDir).count())
    w.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("accept_rate")
      val q = r.getAs[Double]("mean_quality")
      assert(rate >= 0 && rate <= 1)
      assert(q > 0 && q <= 1)
    }
    // the gate is per-doc deterministic: recompute one language bucket
    // locally from the same hash rule
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val qual = graft.operators.TextAnalysis.textStats(spark, sfDir)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lang0 = docs.head._2
    val expect = docs.filter(_._2 == lang0).count { case (id, _) =>
      PolyHash.hash(id.toString) % 1000000 < math.round(qual(id) * 1000000)
    }
    val got = w.find(_.getAs[String]("lang") == lang0).get.getAs[Long]("n_sampled")
    assert(got === expect.toLong, s"lang $lang0 sampled $got vs local $expect")
  }

  test("KL by source: non-negative divergence, every doc accounted") {
    val k = graft.operators.CorpusOps.klBySources(spark, sfDir).collect()
    assert(k.forall(_.getAs[Double]("kl_from_corpus") >= -1e-6))
    assert(k.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sfDir).count())
  }

  test("embedding dimension stats: 64 dims, min <= mean <= max, std finite and non-negative") {
    val s = graft.operators.Similarity.embDimStats(spark, sfDir).collect()
    assert(s.length === 64)
    s.foreach { r =>
      assert(r.getAs[Double]("min_v") <= r.getAs[Double]("mean_v") + 1e-6)
      assert(r.getAs[Double]("mean_v") <= r.getAs[Double]("max_v") + 1e-6)
      val sd = r.getAs[Double]("std_v")
      assert(sd >= 0 && !sd.isNaN && !sd.isInfinite)
    }
  }

  test("MAD outliers: robust stats accounted, outliers a strict minority per type") {
    val m = Analytics.madOutliers(spark, sfDir).cache()
    try {
      assert(m.agg(sum("n_events")).head.getLong(0) ===
        Tables.events(spark, sfDir).count())
      assert(m.filter(col("mad") < 0 || col("med") < 0).count() === 0)
      // by construction |v - med| > 4.4478*MAD can hold for at most
      // half the group (MAD is the median deviation)
      assert(m.filter(col("outlier_share") >= 0.5).count() === 0)
    } finally m.unpersist()
  }

  test("nation trade: Q7 plan pushes the shipdate filter and broadcasts nation") {
    val df = Analytics.nationTrade(spark, sfDir)
    val plan = formatted(df)
    assert(plan.contains("PushedFilters:") &&
           plan.contains("GreaterThanOrEqual(l_shipdate"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // both directions separated, never a same-nation row
    assert(df.filter(col("supp_nation") === col("cust_nation")).count() === 0)
  }

  test("CDC chunks: token mass conserved, distinct hashes bounded, bands ordered") {
    val c = graft.operators.CorpusOps.cdcChunks(spark, sfDir).cache()
    try {
      val totalToks = Tables.documents(spark, sfDir)
        .agg(sum(size(split(col("text"), " ")))).head.getLong(0)
      assert(c.agg(sum("total_tokens")).head.getLong(0) === totalToks)
      assert(c.filter(col("n_distinct") > col("n_chunks")).count() === 0)
      // planted near-dup docs must make SOME chunks repeat verbatim
      val rep = c.agg(sum("n_chunks"), sum("n_distinct")).head()
      assert(rep.getLong(1) < rep.getLong(0),
        "expected repeated chunk content across the near-dup corpus")
      assert(c.filter(col("band") < 0 || col("band") > 8).count() === 0)
    } finally c.unpersist()
  }

  test("waiting suppliers: the aggregate rewrite equals the correlated-EXISTS brute force") {
    val got = Analytics.waitingSuppliers(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("suppkey"), r.getAs[Long]("numwait"))).toSeq
    // brute force: materialize (order, supplier, late) then apply the
    // EXISTS / NOT-EXISTS conditions literally per late pair
    val j = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_suppkey"), to_date(col("l_shipdate")).as("sd"))
      .join(Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("late", datediff(col("sd"), col("od")) > 60)
      .select("l_orderkey", "l_suppkey", "late").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = j.groupBy(_._1)
    val want = j.filter(_._3).map { case (ok, sk, _) => (ok, sk) }.distinct
      .filter { case (ok, sk) =>
        val rows = byOrder(ok)
        rows.exists(r => r._2 != sk) &&
        !rows.exists(r => r._2 != sk && r._3)
      }
      .groupBy(_._2).map { case (sk, v) => (sk, v.size.toLong) }.toSeq
      .sortBy { case (sk, n) => (-n, sk) }.take(20)
    assert(got === want)
  }

  test("Kaplan-Meier: risk sets shrink, survival is non-increasing in (0, 1]") {
    val km = Analytics.kaplanMeier(spark, sfDir).orderBy("t_days").collect()
    assert(km.nonEmpty)
    // population accounting: the first risk set carries every customer
    // with at least one order minus those censored/evented strictly
    // earlier; d <= n always
    km.foreach { r =>
      assert(r.getAs[Long]("d_events") >= 1)
      assert(r.getAs[Long]("d_events") <= r.getAs[Long]("n_risk"))
    }
    // n_risk strictly decreases across event times (each event time
    // removes at least its own d_events from the risk set)
    km.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_risk") <
               a.getAs[Long]("n_risk"), s"risk set must shrink: $a -> $b")
        // km_survival is NULL only at a terminal d = n event time
        if (!a.isNullAt(a.fieldIndex("km_survival")) &&
            !b.isNullAt(b.fieldIndex("km_survival")))
          assert(b.getAs[Double]("km_survival") <=
                 a.getAs[Double]("km_survival") + 1e-9,
            "survival must be non-increasing")
      case _ => ()
    }
    val s0 = km.head.getAs[Double]("km_survival")
    assert(s0 > 0.0 && s0 <= 1.0)
  }

  test("markov entropy: deterministic sequences read 0; corpus bounded by ln(targets)") {
    import spark.implicits._
    // one user alternating a,b,a,b,... -> every transition is forced
    val d = (1 to 10).map(i => (i.toLong, if (i % 2 == 0) "b" else "a"))
      .toDF("event_id", "event_type")
      .withColumn("user_id", lit(1L))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("event_id")))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
    val dir = java.nio.file.Files.createTempDirectory("markov").toString
    d.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Analytics.markovEntropy(spark, dir).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("cond_entropy") === 0.0, r.toString)
      assert(r.getAs[Long]("n_targets") === 1L)
    }
    assert(math.abs(rows.map(_.getAs[Double]("marginal_share")).sum - 1.0) < 1e-5)
    // corpus: entropy within [0, ln n_targets]
    Analytics.markovEntropy(spark, sfDir).collect().foreach { r =>
      val h = r.getAs[Double]("cond_entropy")
      assert(h >= -1e-9 && h <= math.log(r.getAs[Long]("n_targets").toDouble) + 1e-6,
        r.toString)
    }
  }

  test("ABC classes: parts partitioned, A-prefix bounded by 80%, shares sum to 1") {
    val rows = Analytics.abcClasses(spark, sfDir).collect()
      .map(r => r.getAs[String]("abc_class") ->
        (r.getAs[Long]("n_parts"), r.getAs[Double]("revenue"),
         r.getAs[Double]("revenue_share"))).toMap
    assert(rows.keySet.subsetOf(Set("A", "B", "C")) && rows.contains("C"))
    val totalParts = rows.values.map(_._1).sum
    val distinctParts = Tables.lineitem(spark, sfDir)
      .select("l_partkey").distinct().count()
    assert(totalParts === distinctParts, "classes must partition the parts")
    // class A is the cum<=80% PREFIX, so its share cannot exceed 0.8;
    // A+B cannot exceed 0.95 (same gate at 95)
    val sA = rows.get("A").map(_._3).getOrElse(0.0)
    val sB = rows.get("B").map(_._3).getOrElse(0.0)
    assert(sA <= 0.800001, s"A share $sA")
    assert(sA + sB <= 0.950001, s"A+B share ${sA + sB}")
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-4)
  }

  test("l-diversity: worst-group l within [1, 5], exposure a probability, groups bounded") {
    val rows = Analytics.lDiversity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val minL = r.getAs[Long]("min_l")
      assert(minL >= 1L && minL <= 5L, r.toString) // 5 order priorities exist
      val share = r.getAs[Double]("exposed_share")
      assert(share >= 0.0 && share <= 1.0, r.toString)
      assert(r.getAs[Long]("n_low_diversity") <= r.getAs[Long]("n_groups"))
      // QI grid is bounded by |segments| per nation
      assert(r.getAs[Long]("n_groups") <= 5L, r.toString)
    }
  }
}
