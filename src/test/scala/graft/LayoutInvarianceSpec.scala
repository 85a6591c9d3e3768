package graft

/** Results must be bit-identical regardless of physical layout — the
  * property that makes a re-run on a different cluster (different
  * partition count, different split sizes) reproduce the committed
  * output. Hash-gating, tie-broken windows, and decimal sums are the
  * mechanisms; this spec pins the outcome by running order-sensitive
  * operators under different shuffle-partition counts and comparing
  * exact collected outputs.
  */
class LayoutInvarianceSpec extends SparkSuite {

  private val targets: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
    ("x_training_order", () => graft.operators.CorpusOps.trainingOrder(spark, sfDir)),
    ("x_domain_cap",     () => graft.operators.CorpusOps.domainCap(spark, sfDir)),
    ("x_heavy_hitters",  () => graft.operators.TextAnalysis.heavyHitterTokens(spark, sfDir)),
    ("x_chunk_dedup",    () => graft.operators.CorpusOps.chunkDedup(spark, sfDir)),
    ("x_vocab_coverage", () => graft.operators.TextAnalysis.vocabCoverage(spark, sfDir)),
    // the global rank is computed per-partition + offsets, so layout
    // independence IS its correctness claim
    ("x_quality_deciles", () => graft.operators.CorpusOps.qualityDeciles(spark, sfDir)),
    // k-th smallest via salted two-level rank — same claim
    ("x_kmv_distinct",   () => graft.operators.Dedup.kmvDistinctShingles(spark, sfDir)),
    // winnowing: the packed-BIGINT argmin is order-independent and
    // windows are doc-partitioned — layout independence is the
    // fingerprint-set determinism claim
    ("x_winnowing",      () => graft.operators.Dedup.winnowStats(spark, sfDir)),
    ("x_winnow_overlap", () => graft.operators.Dedup.winnowOverlap(spark, sfDir)),
    // PMI: exact BIGINT counts through one fixed double expression
    ("x_token_pmi",      () => graft.operators.TextAnalysis.tokenPmi(spark, sfDir)),
    // Q19: decimal-exact revenue sum
    ("x_disjunctive_rev", () => graft.operators.Analytics.disjunctiveRevenue(spark, sfDir)),
    // equi-depth binning on the global-rank backbone — layout
    // independence is the backbone's correctness claim
    ("x_equidepth_hist", () => graft.operators.Analytics.equidepthHistogram(spark, sfDir)),
    // r10: the weight-chain indicators are per-symbol windows over a
    // total tick order — layout independence is the ordering claim
    ("x_macd",           () => graft.operators.Finance.macd(spark, sfDir)),
    ("x_ewma_vol",       () => graft.operators.Finance.ewmaVolatility(spark, sfDir)),
    // order-statistic tail: rank ties broken by id, ES decimal-summed
    // then integer-rounded — no float aggregation order anywhere
    ("x_var_hist",       () => graft.operators.Finance.historicalVar(spark, sfDir)),
    // CUSUM argmax: integer statistic, (|dev| desc, t) tie-break
    ("x_cusum",          () => graft.operators.Finance.cusum(spark, sfDir)),
    // KM: decimal log-space sums over the bounded event-time table
    ("x_kaplan_meier",   () => graft.operators.Analytics.kaplanMeier(spark, sfDir)),
    // eigencentrality: per-round two-stage round-12 quantization is
    // exactly the mechanism that makes the iteration layout-proof
    ("x_eigencentrality", () => graft.operators.Graphs.eigenCentrality(spark, sfDir)),
    // Adamic-Adar: round-12 decimal term sums, (score, a, b) cut order
    ("x_link_predict",   () => graft.operators.Graphs.linkPrediction(spark, sfDir)),
    // r10b: Aroon's packed argmax/argmin is order-independent by
    // construction — layout independence is that pack's claim
    ("x_aroon",          () => graft.operators.Finance.aroon(spark, sfDir)),
    // Q10's top-k cut orders by the EXACT decimal revenue sum
    ("x_returned_customers",
                         () => graft.operators.Analytics.returnedItemCustomers(spark, sfDir)),
    // Q2's per-part argmin: integer cents, suppkey tie-break
    ("x_min_cost_supplier",
                         () => graft.operators.Analytics.minCostSupplier(spark, sfDir)),
    // HHI: decimal window total + locked-decimal share squares
    ("x_hhi",            () => graft.operators.Analytics.revenueConcentration(spark, sfDir)),
    // Parkinson: round-12 decimal ln² sums (the bigram-ppl mechanism)
    ("x_parkinson",      () => graft.operators.Finance.parkinson(spark, sfDir)),
    // HITS: per-round two-stage round-12 quantization over a DIRECTED
    // graph — the eigencentrality claim on the new edge set
    ("x_hits",           () => graft.operators.Graphs.hits(spark, sfDir)),
    // r10c: PPR's sparse rank state is rebuilt per round from a
    // round-12-quantized sum — the pageRank layout claim with the
    // full-outer teleport join added
    ("x_ppr",            () => graft.operators.Graphs.personalizedPageRank(spark, sfDir)),
    // Calmar: packed last-close argmax + deterministic IEEE ratios of
    // exact integer cents
    ("x_calmar",         () => graft.operators.Finance.calmar(spark, sfDir)),
    // VR: all-integer variance numerators through one double formula
    ("x_variance_ratio", () => graft.operators.Finance.varianceRatio(spark, sfDir)),
    // ABC: the distributed global prefix sum — layout independence IS
    // the backbone's correctness claim (the withGlobalRank argument)
    ("x_abc_classes",    () => graft.operators.Analytics.abcClasses(spark, sfDir)),
    // Theil-Sen: IEEE slope-ratio sort with full integer tie-break
    ("x_theil_sen",      () => graft.operators.Finance.theilSen(spark, sfDir)),
    // Hurst: 5 pivoted integer variances through one literal-ordered
    // OLS expression — no cross-row float sums anywhere
    ("x_hurst",          () => graft.operators.Finance.hurst(spark, sfDir)))

  test("order-sensitive operators return identical rows under different shuffle layouts") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    def run(parts: String): Map[String, Seq[String]] =
      try {
        spark.conf.set(key, parts)
        targets.map { case (name, f) =>
          Caches.releaseAll(spark) // layout must not leak via cached blocks
          name -> f().collect().map(_.toString).toSeq
        }.toMap
      } finally spark.conf.set(key, saved)
    val a = run("3")
    val b = run("7")
    targets.foreach { case (name, _) =>
      assert(a(name) == b(name), s"$name output depends on the shuffle layout")
      assert(a(name).nonEmpty, s"$name produced no rows — vacuous comparison")
    }
  }
}
