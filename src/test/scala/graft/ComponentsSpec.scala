package graft

import graft.operators.Dedup

/** Connected-component propagation on synthetic graphs — the corpus
  * oracle only exercises tiny clusters (diameter ~2), so the
  * multi-round convergence path needs direct coverage.
  */
class ComponentsSpec extends SparkSuite {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Dedup.componentsFromPairs(edges.toDF("doc_a", "doc_b"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("a deep chain collapses to one component (multi-round convergence)") {
    // 1-2-3-4-5-6 has diameter 5: min-label propagation needs several
    // rounds to carry label 1 to node 6
    val comps = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)))
    assert(comps == Map(1L -> (6L, 6L)), s"got $comps")
  }

  test("disjoint clusters keep separate roots") {
    val comps = run(Seq((5L, 4L), (10L, 11L), (11L, 12L), (20L, 21L)))
    assert(comps == Map(4L -> (2L, 5L), 10L -> (3L, 12L), 20L -> (2L, 21L)),
      s"got $comps")
  }

  test("a cycle converges (propagation must not loop forever)") {
    val comps = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(comps == Map(1L -> (3L, 3L)), s"got $comps")
  }

  test("a 1000-node chain converges within 12 rounds (pointer jumping)") {
    // diameter 999: plain min-hop needs 999 rounds (the pre-r8 code
    // threw at maxIters=15); hash-to-min doubling reaches the root in
    // ~log2(999) = 10-11 improvement rounds, +1 to observe the fixed
    // label sum. maxIters=12 is the bound the scaladoc sells.
    val chain = (1L until 1000L).map(i => (i, i + 1))
    val comps = run(chain) // run() applies the default maxIters
    assert(comps == Map(1L -> (1000L, 1000L)), s"got $comps")
    val tight = Dedup.componentsFromPairs(
      chain.toDF("doc_a", "doc_b"), maxIters = 12).collect()
    assert(tight.length == 1 && tight.head.getLong(1) == 1000L)
  }

  test("an empty pair graph short-circuits to an empty result (no iteration)") {
    // Regression (r3 ADVICE): with zero edges the per-round label sum
    // was NULL every round, the sum-comparison convergence test never
    // fired, and the loop burned maxIters rounds then threw.
    Caches.releaseAll(spark)
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.labelPropagation(empty).collect().isEmpty)
    assert(Dedup.componentsFromPairs(empty).collect().isEmpty)
    assert(Caches.isEmpty(spark),
      "the empty-graph short-circuit must release its pair checkpoint")
    // Threshold high enough that nearDupMinhash yields zero pairs —
    // the composite must return all-survivor counts, not throw.
    val surv = Dedup.dedupSurvivors(spark, sfDir, threshold = 1.01).collect()
    assert(surv.nonEmpty)
    surv.foreach(r => assert(r.getLong(1) >= r.getLong(2) && r.getLong(2) > 0))
  }

  test("delete cascade equals a local union-find over the tombstone-filtered graph") {
    val pairs = Dedup.nearDupMinhash(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val kept = pairs.filter { case (a, b) => a % 7 != 0 && b % 7 != 0 }
    assert(kept.length < pairs.length,
      "the tombstone list must actually intersect the pair graph")
    // local union-find over the surviving edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    kept.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.toSeq.map(x => (find(x), x)).groupBy(_._1)
      .map { case (root, xs) => (root, xs.length.toLong, xs.map(_._2).max) }
      .toSeq.sortBy(_._1)
    val got = Dedup.deleteCascade(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, "distributed cascade differs from local union-find")
    got.foreach { case (root, _, maxM) =>
      assert(root % 7 != 0 && maxM % 7 != 0, "tombstoned ids must not appear")
    }
    // the cascade must actually differ from the unfiltered component map
    val before = Dedup.dupComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got != before, "deletion changed nothing — tombstones missed the graph")
  }

  test("graphParts scales with the pair graph, not the session default") {
    assert(Dedup.graphPartsFor(1L) == 1)
    assert(Dedup.graphPartsFor(255L) == 1)
    assert(Dedup.graphPartsFor(500000L) == 1)
    assert(Dedup.graphPartsFor(500001L) == 2)
    assert(Dedup.graphPartsFor(10000000L) == 20)
    assert(Dedup.graphPartsFor(Long.MaxValue / 2) == 200, "capped")
  }

  test("hot band buckets are dropped from candidate generation") {
    // One honest 3-doc bucket and one pathological bucket above the
    // cap: pairs must come only from the honest bucket.
    val hot = (1L to 10L).map(i => (i, 0, 999L))
    val ok  = Seq((100L, 1, 7L), (101L, 1, 7L), (102L, 1, 7L))
    val bands = (hot ++ ok).toDF("doc_id", "band", "bh")
    val buckets = bands.groupBy("band", "bh")
      .agg(org.apache.spark.sql.functions.collect_list($"doc_id").as("ids"))
    val pairs = Dedup.bucketPairs(buckets, bucketCap = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 101L), (100L, 102L), (101L, 102L)), s"got $pairs")
    // at-or-under-cap buckets are kept (boundary: cap == bucket size)
    val atCap = Dedup.bucketPairs(buckets, bucketCap = 10).count()
    assert(atCap == 45 + 3, "cap is inclusive")
  }

  test("every SF's max band bucket stays under BandBucketCap (oracle models no cap)") {
    // The DuckDB oracle does not model the hot-bucket cap, so
    // correctness at a scale factor silently relies on no bucket ever
    // crossing it — this makes SF growth fail HERE, loudly, instead of
    // as an unexplained hash mismatch in verify.
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val maxBucket = Dedup.minhashBands(spark, dir)
        .groupBy("band", "bh")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
        .agg(org.apache.spark.sql.functions.max($"n")).head().getLong(0)
      // margin, not just <=: buckets grow with the corpus, and a max
      // bucket that CREEPS toward the cap across SF bumps should fail
      // here (loudly, with headroom to react) before the cap starts
      // dropping pairs the oracle keeps
      assert(maxBucket * 4 <= Dedup.BandBucketCap,
        s"$sf max band bucket $maxBucket is within 4x of cap " +
        s"${Dedup.BandBucketCap}: corpus growth is eroding the oracle's " +
        "no-cap assumption — model the cap in the oracle or raise it")
      Caches.releaseAll(spark)
    }
  }

  test("simhash near-dup banding has PERFECT recall at Hamming <= 3 (pigeonhole)") {
    val found = Dedup.simhashNearDup(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(found.forall(_._2 <= 3), "verify stage must drop far pairs")
    // brute-force ground truth over the 64-bit two-word fingerprints:
    // 4 disjoint 16-bit bands guarantee every <= 3-bit pair shares at
    // least one band
    val sims = Dedup.simhashDocs64(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val truth = (for {
      (a, (la, ha)) <- sims; (b, (lb, hb)) <- sims
      if a < b &&
        java.lang.Long.bitCount(la ^ lb) + java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(found.map(_._1).toSet == truth,
      s"banding recall must be exact: found ${found.length}, truth ${truth.size}")
  }

  test("pigeonhole property: any <=3-bit corruption shares a band key (random prints)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    def bandKeys(lo: Long, hi: Long): Seq[Long] =
      Seq(lo & 0xFFFF, (lo >> 16) & 0xFFFF, hi & 0xFFFF, (hi >> 16) & 0xFFFF)
    val genWord = Gen.choose(0L, 0xFFFFFFFFL)
    val genFlips = Gen.choose(0, 3).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 63)).map(_.distinct))
    val prop = Prop.forAll(genWord, genWord, genFlips) { (lo, hi, flips) =>
      val (lo2, hi2) = flips.foldLeft((lo, hi)) { case ((l, h), b) =>
        if (b < 32) (l ^ (1L << b), h) else (l, h ^ (1L << (b - 32)))
      }
      val shared = bandKeys(lo, hi).zip(bandKeys(lo2, hi2)).exists(p => p._1 == p._2)
      val hamming = java.lang.Long.bitCount(lo ^ lo2) + java.lang.Long.bitCount(hi ^ hi2)
      shared && hamming <= 3 // <= 3 distinct flips corrupt <= 3 of 4 bands
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("64-bit print arithmetic matches a pure-Scala reference on real docs") {
    // independent of both Spark expression evaluation and the DuckDB
    // oracle: recompute the two vote words from first principles
    val docs = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(5)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val got = Dedup.simhashDocs64(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    docs.foreach { case (id, text) =>
      val shingles =
        if (text.length < Dedup.ShingleN) Seq(text)
        else (0 to text.length - Dedup.ShingleN).map(i =>
          text.substring(i, i + Dedup.ShingleN)).distinct
      val hs = shingles.map(s =>
        s.foldLeft(0L)((acc, c) => (acc * 31 + c.toLong) % Dedup.P))
      def word(mult: Long): Long = (0 until 32).map { j =>
        val votes = hs.map(h => (((h * mult) >> 15) & 0xFFFFFFFFL) >> j & 1L)
          .map(b => b * 2 - 1).sum
        if (votes > 0) 1L << j else 0L
      }.sum
      assert(got(id) == (word(Dedup.MixA), word(Dedup.MixB)),
        s"doc $id print mismatch")
    }
  }

  test("64-bit simhash words stay in non-negative 32-bit range") {
    val sims = Dedup.simhashDocs64(spark, sfDir).collect()
    assert(sims.nonEmpty)
    sims.foreach { r =>
      val (lo, hi) = (r.getLong(1), r.getLong(2))
      assert(lo >= 0L && lo <= 0xFFFFFFFFL, s"sim_lo out of range: $lo")
      assert(hi >= 0L && hi <= 0xFFFFFFFFL, s"sim_hi out of range: $hi")
    }
  }

  test("unified graph subsumes each family and can only shrink survivors") {
    val unified = Dedup.unifiedPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = Dedup.nearDupMinhash(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val simhash = Dedup.simhashNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(minhash.subsetOf(unified), "every MinHash pair is a unified edge")
    assert(simhash.subsetOf(unified), "every SimHash pair is a unified edge")
    // more edges can only merge more docs into clusters, so the
    // unified pass keeps at most as many survivors per language
    val perFamily = Dedup.dedupSurvivors(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val uni = Dedup.dedupSurvivorsUnified(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(uni.map(_._1).toSet == perFamily.keySet)
    uni.foreach { case (lang, nDocs, nSurv) =>
      assert(nSurv <= perFamily(lang), s"$lang unified survivors must not exceed MinHash-only")
      assert(nSurv >= 1 && nSurv <= nDocs)
    }
  }

  test("survivor counts are bounded and consistent per language") {
    val docs = graft.Tables.documents(spark, sfDir)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Dedup.dedupSurvivors(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSet == totals.keySet, "every language present")
    rows.foreach { case (lang, nDocs, nSurv) =>
      assert(nDocs == totals(lang), s"$lang total matches the corpus")
      assert(nSurv >= 1 && nSurv <= nDocs, s"$lang survivors in (0, total]")
    }
  }
}
