package graft

import graft.operators.Stats
import org.apache.spark.sql.functions._

/** Hand-checked values and plan shapes for the hypothesis-test
  * family ([[graft.operators.Stats]]). The oracle gate proves
  * engine-exactness at corpus scale; these tests pin the FORMULAS to
  * published textbook values on tiny hand datasets, and the plan
  * shapes to their scalable forms.
  */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("spearman: monotone price-volume symbols hit rho = +/-1, bounds hold") {
    val out = Stats.spearman(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho out of range: $r")
      assert(r.getAs[Long]("n") >= 3)
    }
  }

  test("spearman formula matches the classic hand example (perfect + tied)") {
    // events-shaped frame via a temp dir is overkill: check the rank
    // identity directly. Doubled average ranks of (1,2,2,3) are
    // 2,5,5,8 — average ranks 1, 2.5, 2.5, 4.
    val df = Seq(1L, 2L, 2L, 3L).toDF("m")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("m").asc)
    val peers = org.apache.spark.sql.expressions.Window
      .orderBy(col("m").asc).rangeBetween(0, 0)
    val dr = df.select((lit(2L) * rank().over(w).cast("long") +
      count(lit(1)).over(peers) - lit(1L)).as("dr"))
      .collect().map(_.getLong(0)).sorted
    assert(dr.toSeq == Seq(2L, 5L, 5L, 8L))
  }

  test("mann-whitney: U within [0, n1*n2], z finite, tie term sane") {
    val out = Stats.mannWhitney(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
      val u = r.getAs[Double]("u_stat")
      assert(u >= -1e-9 && u <= n1.toDouble * n2 + 1e-9, s"U out of range: $r")
      assert(!r.getAs[Double]("z_score").isNaN)
    }
  }

  test("welch t: antisymmetric in the pair order and df <= na+nb-2") {
    val out = Stats.welchT(spark, sfDir).collect()
    assert(out.length >= 3) // 5 event types -> up to 10 ordered pairs
    out.foreach { r =>
      val df = r.getAs[Double]("df")
      val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
      // Welch-Satterthwaite df is bounded by the pooled df and at
      // least min(na,nb)-1
      assert(df <= (na + nb - 2).toDouble + 1e-6, s"df too large: $r")
      assert(df >= (math.min(na, nb) - 1).toDouble - 1e-6, s"df too small: $r")
    }
  }

  test("chi-square: single row, nonnegative, V in [0,1], df = (r-1)(c-1)") {
    val out = Stats.chiSquare(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("chi2") >= 0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0 && v <= 1 + 1e-9)
    assert(r.getAs[Long]("df") == 8L) // 5 priorities x 3 statuses
  }

  test("t-closeness: EMD within [0,1], counts consistent") {
    val out = Stats.tCloseness(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val mx = r.getAs[Double]("max_emd"); val mn = r.getAs[Double]("mean_emd")
      assert(mx >= 0 && mx <= 1 + 1e-9)
      assert(mn >= 0 && mn <= mx + 1e-9)
      assert(r.getAs[Long]("n_violations") <= r.getAs[Long]("n_cells"))
    }
  }

  test("plan: spearman rank windows share ONE (symbol) exchange; no global window") {
    val plan = Stats.spearman(spark, sfDir)
      .queryExecution.executedPlan.toString()
    // both rank windows and the aggregation partition by symbol —
    // a single hashpartitioning(symbol...) exchange is reused
    val symbolExchanges = plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning(symbol"))
    assert(symbolExchanges <= 1, s"expected one (symbol) exchange:\n$plan")
    assert(!plan.contains("SinglePartition, ENSURE_REQUIREMENTS"),
      s"global single-reducer window leaked into spearman:\n$plan")
  }

  test("kruskal-wallis: textbook two-group hand value, tie-free") {
    // click={1,2,3}, view={4,5,6} cents: ranks 1..6, R1=6, R2=15
    // H = 12/(6*7)*(36/3 + 225/3) - 3*7 = 3.857143 (no tie correction)
    val df = Seq(("click", 0.01), ("click", 0.02), ("click", 0.03),
      ("view", 0.04), ("view", 0.05), ("view", 0.06)).zipWithIndex
      .map { case ((t, v), i) => (i.toLong, t, v) }
      .toDF("event_id", "event_type", "value")
      .withColumn("user_id", lit(1L))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("event_id")))
      .withColumn("props", lit("""{"k": 1}"""))
    val dir = java.nio.file.Files.createTempDirectory("kw").toString
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Stats.kruskalWallis(spark, dir).head()
    assert(r.getAs[Long]("n_total") == 6L)
    assert(r.getAs[Long]("df") == 1L)
    assert(math.abs(r.getAs[Double]("h_stat") - 3.857143) < 1e-6, r.toString)
  }

  test("kruskal-wallis on the corpus: H nonnegative, df = 4") {
    val r = Stats.kruskalWallis(spark, sfDir).head()
    assert(r.getAs[Double]("h_stat") >= 0)
    assert(r.getAs[Long]("df") == 4L)
  }

  test("media dhash census: hamming bounded, counts consistent") {
    val rows = graft.operators.Multimodal.dhashNearDup(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("hamming") <= 1)
      assert(r.getAs[Long]("n_docs") <= 2 * r.getAs[Long]("n_pairs"))
    }
  }

  test("ndcg/mrr: both within [0,1]; mrr positive only when brute #1 retrieved") {
    val out = graft.operators.Similarity.knnIvfNdcg(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val n = r.getAs[Double]("ndcg"); val rr = r.getAs[Double]("reciprocal_rank")
      assert(n >= 0 && n <= 1 + 1e-9, r.toString)
      assert(rr >= 0 && rr <= 1 + 1e-9, r.toString)
      // rr is 1/pos for pos in 1..5 or 0
      val valid = (1 to 5).map(p => math.rint(1e6 / p) / 1e6) :+ 0.0
      assert(valid.exists(v => math.abs(v - rr) < 1e-9), r.toString)
    }
  }

  test("ams f2: nine-estimator median lands within 5x of exact on the test corpus") {
    val r = graft.operators.Analytics.amsF2(spark, sfDir).head()
    assert(r.getAs[Long]("f2_exact") > 0)
    assert(r.getAs[Long]("f2_est") >= 0)
    // AMS guarantees E[est] = F2 with bounded variance; a 9-way median
    // on 15 keys is loose, so pin only a sanity envelope
    assert(r.getAs[Double]("rel_err") < 5.0, r.toString)
  }

  test("forecast revenue (Q6): matches a manual recount of the filter") {
    val spark2 = spark
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark2, sfDir)
    val n = li.filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24).count()
    val r = graft.operators.Analytics.forecastRevenue(spark2, sfDir).head()
    assert(r.getAs[Long]("n_items") == n)
    assert(r.getAs[Double]("revenue") > 0 || n == 0)
  }

  test("dp release: deterministic, epsilon recorded, error accounting consistent") {
    val a = graft.operators.Analytics.dpRelease(spark, sfDir).collect()
    val b = graft.operators.Analytics.dpRelease(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "seeded release must be reproducible")
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Double]("epsilon") == 1.0)
      assert(r.getAs[Double]("l1_error") >= r.getAs[Double]("max_abs_error") ||
        r.getAs[Long]("n_cells") == 1L)
      assert(math.abs(r.getAs[Double]("released_total") -
        r.getAs[Long]("true_total")) <= r.getAs[Double]("l1_error") + 1e-6)
    }
  }

  test("xi correlation: closed form 1 - 3/(n+1) on a perfect monotone map") {
    import spark.implicits._
    // volume = price rank exactly -> y is a function of x
    val n = 9
    val df = (1 to n).map(i => (i.toLong, 1.0 + 0.01 * i)).toDF("event_id", "value")
      .withColumn("user_id", lit(1L))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("event_id")))
      .withColumn("event_type", lit("tick"))
      .withColumn("props", concat(lit("{\"k\": "), col("event_id"), lit("}")))
    val dir = java.nio.file.Files.createTempDirectory("xi").toString
    df.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Stats.xiCorrelation(spark, dir).head()
    assert(r.getAs[Long]("n") == n.toLong)
    val expect = math.rint((1.0 - 3.0 / (n + 1)) * 1e6) / 1e6
    assert(r.getAs[Double]("xi") == expect, r.toString)
    // corpus-wide: xi <= 1 always
    Stats.xiCorrelation(spark, sfDir).collect()
      .foreach(r2 => assert(r2.getAs[Double]("xi") <= 1.0 + 1e-9))
  }

  test("cohen's kappa: bounded by accuracy's chance correction, one row") {
    val r = graft.operators.TextAnalysis.cohensKappa(spark, sfDir).head()
    val acc = r.getAs[Double]("accuracy"); val k = r.getAs[Double]("kappa")
    assert(acc >= 0 && acc <= 1)
    assert(k <= acc + 1e-9, s"kappa $k cannot exceed accuracy $acc with nonneg chance")
    assert(k >= -1 - 1e-9 && k <= 1 + 1e-9)
  }

  test("embedding MMD: nonnegative, complete label-pair grid") {
    val rows = graft.operators.Similarity.embMmd(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("mmd_sq") >= 0)
      assert(r.getAs[Long]("label_a") < r.getAs[Long]("label_b"))
    }
    val k = rows.flatMap(r => Seq(r.getAs[Long]("label_a"), r.getAs[Long]("label_b"))).distinct.length
    assert(rows.length == k * (k - 1) / 2, s"expected full pair grid for $k labels")
  }

  test("theil indices: nonnegative, zero iff segment spend is flat") {
    val rows = graft.operators.Analytics.theilIndex(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // micro rounding can dip a hair below zero on near-equal spends
      assert(r.getAs[Double]("theil_t") >= -1e-5, r.toString)
      assert(r.getAs[Double]("theil_l") >= -1e-5, r.toString)
    }
  }

  test("brown-forsythe: F nonnegative, dfs consistent with 5 types") {
    val r = graft.operators.Analytics.brownForsythe(spark, sfDir).head()
    assert(r.getAs[Double]("f_stat") >= 0)
    assert(r.getAs[Long]("df_between") == 4L)
    assert(r.getAs[Long]("df_within") ==
      r.getAs[Long]("n_events") - 5L)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta >= 0 && eta <= 1 + 1e-9)
  }

  test("plan: welch pair join broadcasts the 5-row aggregate") {
    val plan = Stats.welchT(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("runs test: alternating series maxes runs (z > 0), monotone pins R = 1") {
    import spark.implicits._
    def mk(vals: Seq[Double]): String = {
      val df = vals.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }
        .toDF("event_id", "value")
        .withColumn("user_id", lit(1L))
        .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("event_id")))
        .withColumn("event_type", lit("tick"))
        .withColumn("props", lit("""{"k": 1}"""))
      val dir = java.nio.file.Files.createTempDirectory("runs").toString
      df.select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // perfect alternation: 20 moves, 20 runs, z positive (mean-reverting)
    val alt = Stats.runsTest(spark, mk((1 to 21).map(i =>
      if (i % 2 == 0) 2.0 else 1.0))).head()
    assert(alt.getAs[Long]("r_runs") == 20L)
    assert(alt.getAs[Double]("z_score") > 3, alt.toString)
    // monotone up: all-up signs -> np > 0, nm = 0 -> dropped
    assert(Stats.runsTest(spark, mk((1 to 15).map(i => 1.0 + 0.01 * i)))
      .count() == 0)
    // one down step inside an up series: ++ | - | ++ = 3 runs
    val three = Stats.runsTest(spark, mk(Seq(1.0, 1.1, 1.2, 1.0, 1.3, 1.4))).head()
    assert(three.getAs[Long]("r_runs") == 3L, three.toString)
  }

  test("plan pins: r11 operators keep their scale shapes") {
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // RA link prediction: wedge equi-join only — never a cross product
    val ra = plan(graft.operators.Graphs.resourceAllocation(spark, sfDir))
    assert(!ra.contains("CartesianProduct") &&
           !ra.contains("BroadcastNestedLoopJoin"), ra)
    // MMD: the label-pair join is BROADCAST over the bounded dim table
    val mmd = plan(graft.operators.Similarity.embMmd(spark, sfDir))
    assert(mmd.contains("BroadcastHashJoin"), mmd)
    assert(!mmd.contains("CartesianProduct"), mmd)
    // t-closeness: no single-reducer window over fact rows — the only
    // windows partition by (event_type, hour) cells
    val tc = plan(graft.operators.Stats.tCloseness(spark, sfDir))
    assert(!tc.contains("Window [") ||
      !tc.contains("SinglePartition, ENSURE_REQUIREMENTS"), tc)
    // kruskal: the global prefix window runs over the DISTINCT-cent
    // aggregate (an Aggregate feeds the single-partition window), and
    // the rank join back is broadcast
    val kw = plan(graft.operators.Stats.kruskalWallis(spark, sfDir))
    assert(kw.contains("BroadcastHashJoin"), kw)
    // media dhash census: everything joined is the distinct-hash
    // table; payloads never reach a join (no binary in join keys)
    val dh = plan(graft.operators.Multimodal.dhashNearDup(spark, sfDir))
    assert(!dh.contains("CartesianProduct") &&
           !dh.contains("BroadcastNestedLoopJoin"), dh)
  }

  test("plan pins: adx and coppock share one (symbol[, day]) exchange chain") {
    def hashEx(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .linesIterator.count(_.contains("Arguments: hashpartitioning"))
    // daily-bar indicators: (symbol, day) bar build + (symbol) windows
    assert(hashEx(graft.operators.Finance.adxDmi(spark, sfDir)) <= 2)
    assert(hashEx(graft.operators.Finance.coppock(spark, sfDir)) <= 2)
    assert(hashEx(graft.operators.Finance.dpo(spark, sfDir)) <= 2)
    assert(hashEx(graft.operators.Finance.elderRay(spark, sfDir)) <= 2)
    // tick-level: one (symbol) exchange
    assert(hashEx(graft.operators.Finance.ljungBox(spark, sfDir)) <= 1)
    assert(hashEx(graft.operators.Finance.pageHinkley(spark, sfDir)) <= 1)
  }
}
