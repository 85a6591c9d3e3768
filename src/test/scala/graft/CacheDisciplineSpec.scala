package graft

import graft.operators.{Analytics, CorpusOps, Dedup, Similarity, TextAnalysis}

/** The Caches contract (r2/r3 ADVICE): operators may leave
  * materialized intermediates for the session, but a Verify-style
  * pass (consume the result, then Caches.releaseAll) must leave ZERO
  * persistent entries — covering both Dataset caches and the
  * localCheckpoint block sets that clearCache() alone cannot see.
  */
class CacheDisciplineSpec extends SparkSuite {

  private def consume(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  test("a Verify-style pass over every persisting operator releases all blocks") {
    // construction is deferred: released checkpoint blocks cannot be
    // recomputed, so each op must build AFTER the previous release
    val persistingOps = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "nearDupMinhash"  -> (() => Dedup.nearDupMinhash(spark, sfDir)),
      "dupComponents"   -> (() => Dedup.dupComponents(spark, sfDir)),
      "dedupSurvivors"  -> (() => Dedup.dedupSurvivors(spark, sfDir)),
      "ngramJaccard"    -> (() => Dedup.ngramJaccard(spark, sfDir)),
      "decontaminate"   -> (() => CorpusOps.decontaminate(spark, sfDir)),
      "tfidfTopTerms"   -> (() => CorpusOps.tfidfTopTerms(spark, sfDir)),
      "knnLshRecall"    -> (() => Similarity.knnLshRecall(spark, sfDir)),
      "pqRecall"        -> (() => Similarity.pqRecall(spark, sfDir)),
      "pqRerankRecall"  -> (() => Similarity.pqRerankRecall(spark, sfDir)),
      "ivfPqRecall"     -> (() => Similarity.ivfPqRecall(spark, sfDir)),
      "embeddingNearDup" -> (() => Similarity.embeddingNearDup(spark, sfDir)),
      "heavyHitterTokens" -> (() => TextAnalysis.heavyHitterTokens(spark, sfDir)),
      "vocabCoverage"   -> (() => TextAnalysis.vocabCoverage(spark, sfDir)),
      "vocabOverlap"    -> (() => TextAnalysis.vocabOverlap(spark, sfDir)),
      "minhashErrorAudit" -> (() => Dedup.minhashErrorAudit(spark, sfDir)),
      "minhashThresholdSweep" -> (() => Dedup.minhashThresholdSweep(spark, sfDir)),
      "kmvDistinctShingles" -> (() => Dedup.kmvDistinctShingles(spark, sfDir)),
      "deleteCascade"   -> (() => Dedup.deleteCascade(spark, sfDir)),
      "qualityDeciles"  -> (() => CorpusOps.qualityDeciles(spark, sfDir)),
      "contaminationByBench" -> (() => CorpusOps.contaminationByBench(spark, sfDir)),
      "curationFunnel"  -> (() => CorpusOps.curationFunnel(spark, sfDir)),
      "ivfPqResidualRecall" -> (() => Similarity.ivfPqResidualRecall(spark, sfDir)),
      "semanticDedup"   -> (() => Similarity.semanticDedup(spark, sfDir)),
      "zorderSkipping"  -> (() => Analytics.zorderSkipping(spark, sfDir)),
      "clusterPurity"   -> (() => Similarity.clusterPurity(spark, sfDir)),
      "splitLeakage"    -> (() => CorpusOps.splitLeakage(spark, sfDir)),
      "langIdNgram"     -> (() => TextAnalysis.langIdNgram(spark, sfDir)),
      "substringDedup"  -> (() => Dedup.substringDedup(spark, sfDir)),
      "substringHotspots" -> (() => Dedup.substringHotspots(spark, sfDir)),
      "substringStrip"  -> (() => Dedup.substringStrip(spark, sfDir)),
      "langIdHoldout"   -> (() => TextAnalysis.langIdHoldout(spark, sfDir)))
    persistingOps.foreach { case (name, mk) =>
      withClue(s"$name: ") {
        consume(mk())
        Caches.releaseAll(spark)
        assert(Caches.isEmpty(spark),
          s"persistent RDDs left after release: " +
          spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(", "))
      }
    }
  }

  test("graph loops exit holding O(1) generations, not one per round") {
    // r12: pageRank/HITS/BFS/k-core/communities share the
    // Caches.iterate discipline — after the query's action completes,
    // only the edge/degree base tables + the FINAL generation may
    // remain, regardless of round count (a 5-round loop used to hold
    // 5 superseded rank generations until releaseAll).
    import graft.operators.Graphs
    val loops = Seq[(String, Int, () => org.apache.spark.sql.DataFrame)](
      // bounds: base checkpoints (edges/adj/deg/seeds) + final state
      ("pageRank", 4, () => Graphs.pageRank(spark, sfDir, iters = 5)),
      ("hits", 3, () => Graphs.hits(spark, sfDir, iters = 3)),
      ("bfsLevels", 5, () => Graphs.bfsLevels(spark, sfDir, depth = 4)),
      ("kCorePeel", 3, () => Graphs.kCorePeel(spark, sfDir, rounds = 5)),
      ("communities", 4, () => Graphs.communities(spark, sfDir, rounds = 3)))
    loops.foreach { case (name, bound, mk) =>
      withClue(s"$name: ") {
        Caches.releaseAll(spark)
        consume(mk())
        val live = spark.sparkContext.getPersistentRDDs.size
        assert(live <= bound,
          s"loop leaked generations: $live persistent RDDs (bound $bound)")
        Caches.releaseAll(spark)
        assert(Caches.isEmpty(spark))
      }
    }
  }

  test("labelPropagation frees its loop generations before returning") {
    // After construction (which runs the iterative loop eagerly), only
    // the RESULT's blocks may remain — not one generation per round,
    // and not the pair/seed checkpoints.
    Caches.releaseAll(spark)
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val labels = Dedup.labelPropagation(pairs)
    val live = spark.sparkContext.getPersistentRDDs.size
    assert(live <= 2, s"expected only the result's blocks, found $live persistent RDDs")
    assert(labels.count() == 6)
    Caches.releaseAll(spark)
    assert(Caches.isEmpty(spark))
  }
}
