package graft

import org.apache.spark.sql.functions._

import graft.operators.{Analytics, Dedup, Multimodal, Similarity, TextAnalysis}

/** End-to-end checks of the LLM-pipeline operators over the smallest
  * driver corpus (sf0.001; the DuckDB hash-compare at sf0.01 is the
  * primary gate — these are fast invariants and spot checks).
  */
class PipelineOpsSpec extends SparkSuite {

  test("exactDedup: one survivor per distinct content, survivor is min doc_id") {
    val docs = Tables.documents(spark, sfDir)
    val out = Dedup.exactDedup(spark, sfDir)
    assert(out.columns.toSeq == Seq("keep_id", "n_copies"))
    val total = out.agg(sum("n_copies")).head().getLong(0)
    assert(total == docs.count(), "copies must partition the corpus")
  }

  test("nearDupMinhash: pairs are ordered, jaccard within [threshold, 1]") {
    val rows = Dedup.nearDupMinhash(spark, sfDir, threshold = 0.8).collect()
    assert(rows.nonEmpty, "corpus has planted near-duplicates")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.8 && j <= 1.0)
    }
  }

  test("minhashErrorAudit: superset of the thresholded pairs, exact values agree") {
    val audit = Dedup.minhashErrorAudit(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
                 (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(audit.nonEmpty, "band buckets produce candidate pairs")
    audit.foreach { case ((a, b), (est, exact, err)) =>
      assert(a < b, "canonical pair order")
      assert(est >= 0.0 && est <= 1.0 && exact >= 0.0 && exact <= 1.0)
      // est is a multiple of 1/16 (agreeing components over 16)
      assert(math.abs(est * 16 - math.round(est * 16)) < 1e-9, s"est=$est")
      assert(math.abs(err - math.abs(est - exact)) < 1e-6)
    }
    // every pair the thresholded pipeline emits is in the audit with
    // the same exact Jaccard (same candidates, no threshold)
    val strict = Dedup.nearDupMinhash(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    assert(strict.nonEmpty)
    strict.foreach { case (k, j) =>
      assert(audit.contains(k), s"thresholded pair $k missing from audit")
      assert(audit(k)._2 == j, s"exact jaccard drifted for $k")
    }
    assert(audit.size >= strict.size)
  }

  test("minhash threshold sweep matches a local recount of the audit table") {
    val audit = Dedup.minhashErrorAudit(spark, sfDir).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    val sweep = Dedup.minhashThresholdSweep(spark, sfDir).collect()
    assert(sweep.map(_.getDouble(0)).toSeq == Seq(0.5, 0.7, 0.9))
    sweep.foreach { r =>
      val t = r.getDouble(0)
      val (np, tp, fp, fn) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np == audit.length, "n_pairs is the full candidate set at every threshold")
      val ltp = audit.count { case (e, x) => e >= t && x >= t }.toLong
      val lfp = audit.count { case (e, x) => e >= t && x < t }.toLong
      val lfn = audit.count { case (e, x) => e < t && x >= t }.toLong
      assert((tp, fp, fn) == ((ltp, lfp, lfn)), s"confusion counts at t=$t")
      if (tp + fp > 0) {
        assert(!r.isNullAt(5))
        assert(math.abs(r.getDouble(5) - tp.toDouble / (tp + fp)) < 1e-6)
      } else assert(r.isNullAt(5), "precision undefined with no positives")
      if (tp + fn > 0) {
        assert(!r.isNullAt(6))
        assert(math.abs(r.getDouble(6) - tp.toDouble / (tp + fn)) < 1e-6)
      } else assert(r.isNullAt(6), "recall undefined with no exact positives")
    }
    // positives can only shrink as the threshold rises
    val estPos = sweep.map(r => r.getLong(2) + r.getLong(3))
    assert(estPos.zip(estPos.tail).forall { case (a, b) => a >= b })
  }

  test("PQ-ADC recall audit: one row per query, hits bounded, signal present") {
    val rows = Similarity.pqRecall(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 10, "one row per query")
    rows.foreach { case (q, h, rec) =>
      assert(q >= 0 && q < 10)
      assert(h >= 0 && h <= 5, s"hits out of range for query $q")
      assert(math.abs(rec - h.toDouble / 5) < 1e-9)
    }
    // 64x compression cannot have zero signal on this corpus: ADC must
    // recover at least some exact neighbors overall
    assert(rows.map(_._2).sum > 0, "ADC found no true neighbors at all")
  }

  test("IVF-PQ composite: one row per query, hits bounded, pruning+compression has signal") {
    val rows = Similarity.ivfPqRecall(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 10)
    rows.foreach { case (q, h, rec) =>
      assert(h >= 0 && h <= 5, s"hits out of range for query $q")
      assert(math.abs(rec - h.toDouble / 5) < 1e-9)
    }
    assert(rows.map(_._2).sum > 0, "composite found no true neighbors at all")
  }

  test("PQ rerank recovers recall over raw ADC; full-width rerank is exact") {
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = df.collect().map(_.getDouble(2))
      rows.sum / rows.length
    }
    val raw = mean(Similarity.pqRecall(spark, sfDir))
    val rr = mean(Similarity.pqRerankRecall(spark, sfDir))
    assert(rr >= raw, s"re-ranking must not lose recall (raw $raw vs rerank $rr)")
    // a candidate list as wide as the corpus re-ranks everything
    // exactly -> recall 1.0 by construction
    val full = mean(Similarity.pqRerankRecall(spark, sfDir, rerankN = 1000))
    assert(full == 1.0, s"full-width rerank must be exact, got $full")
  }

  /** (vec_id, label, micro-unit coords) of every embedding, for local
    * brute-force recomputation — BigDecimal HALF_UP matches Spark's
    * round() on the possibly-negative coordinates (math.round would
    * diverge on exact-.5 negatives).
    */
  private def microVecs(): Array[(Long, Long, Array[Long])] =
    Tables.embeddings(spark, sfDir).select("vec_id", "label", "embedding")
      .collect()
      .map { r =>
        val m = r.getSeq[Float](2).map(f =>
          BigDecimal(f.toDouble * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray
        (r.getLong(0), r.getInt(1).toLong, m)
      }

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum

  test("semanticDecontam: flagged rows match a local brute nearest-bench recompute") {
    val vecs = microVecs()
    val bench = vecs.filter(_._1 < 20)
    val corpus = vecs.filter(_._1 >= 20)
    val maxD2 = 1300000000000L
    val want = corpus.flatMap { case (vid, _, m) =>
      // argmin with (d2, bench_id) tie-break — the operator's contract
      val (bd2, bid) = bench.map { case (b, _, bm) => (d2(m, bm), b) }.min
      if (bd2 < maxD2) Some((vid, bid, bd2)) else None
    }.sortBy(_._1).toSeq
    val got = Similarity.semanticDecontam(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, "flagged set must equal the local recompute")
    assert(got.nonEmpty, "calibrated threshold should flag something on this corpus")
    // threshold edges: 0 flags nothing; MaxValue flags the whole corpus side
    assert(Similarity.semanticDecontam(spark, sfDir, maxD2 = 0L).count() == 0)
    assert(Similarity.semanticDecontam(spark, sfDir, maxD2 = Long.MaxValue).count()
      == corpus.length.toLong)
  }

  test("hardNegatives: exact equality with a local brute-force mining pass") {
    val vecs = microVecs()
    val want = vecs.filter(_._1 < 10).sortBy(_._1).map { case (q, lab, qm) =>
      val others = vecs.filter(_._1 != q)
      val (pd2, pid) = others.collect { case (v, l, m) if l == lab => (d2(qm, m), v) }.min
      val (nd2, nid) = others.collect { case (v, l, m) if l != lab => (d2(qm, m), v) }.min
      (q, lab, pid, pd2, nid, nd2, nd2 - pd2)
    }.toSeq
    val got = Similarity.hardNegatives(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
  }

  test("clusterPurity: members partition the corpus, majority bounds hold per cell") {
    val nVecs = Tables.embeddings(spark, sfDir).count()
    val labels = Tables.embeddings(spark, sfDir).select("label")
      .distinct().collect().map(_.getInt(0).toLong).toSet
    val rows = Similarity.clusterPurity(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._2).sum == nVecs, "cells must partition the corpus")
    rows.foreach { case (cell, members, nLabels, topLabel, topN, purity) =>
      assert(nLabels >= 1 && nLabels <= labels.size)
      assert(labels.contains(topLabel), s"cell $cell majority label out of domain")
      assert(topN >= 1 && topN <= members)
      // the majority class is at least an even split across the labels present
      assert(topN * nLabels >= members, s"cell $cell: $topN cannot be the majority of $members over $nLabels labels")
      assert(math.abs(purity - BigDecimal(topN.toDouble / members)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }

  test("KMV sketch: hk is the k-th smallest distinct hash, estimate recomputes locally") {
    val out = Dedup.kmvDistinctShingles(spark, sfDir).collect()
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sfDir).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byLang = docs.groupBy(_._1).map { case (l, rs) =>
      l -> rs.flatMap { case (_, t) =>
        val w = t.split(" ")
        if (w.length < 3) Seq.empty
        else w.sliding(3).map(g => graft.functions.PolyHash.hash(g.mkString(" "))).toSeq
      }.distinct.sorted
    }
    out.foreach { r =>
      val (lang, exact, est, err) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val hs = byLang(lang)
      assert(exact == hs.length.toLong, s"$lang exact distinct")
      val hk = hs(63) // k = 64
      assert(est == 63L * 1000000007L / hk, s"$lang estimator")
      assert(math.abs(err - math.abs(est - exact).toDouble / exact) < 1e-6)
      // k=64 KMV has ~1/sqrt(64) relative sd; 0.5 is a >4-sigma bound
      // on this FIXED corpus (deterministic, not a flaky statistical test)
      assert(err < 0.5, s"KMV implausibly far off for $lang: $est vs $exact")
    }
  }

  test("langIdNgram: confusion matrix matches a local profile-classifier recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def trigrams(s: String): Set[String] =
      if (s.length < 3) Set(s)
      else (1 to s.length - 2).map(i => s.substring(i - 1, i + 2)).toSet
    // top-40 trigrams per lang by doc frequency, (c DESC, tok) order
    val profile: Map[String, Set[String]] = docs
      .flatMap { case (_, lang, text) => trigrams(text).map(lang -> _) }
      .groupBy(identity).map { case ((lang, tok), occ) => (lang, tok, occ.length) }
      .groupBy(_._1).map { case (lang, rows) =>
        lang -> rows.toSeq.sortBy { case (_, tok, c) => (-c, tok) }
          .take(40).map(_._2).toSet
      }
    val want = docs.map { case (_, lang, text) =>
      val gs = trigrams(text)
      val scores = profile.toSeq
        .map { case (pl, toks) => (pl, (gs & toks).size) }
        .filter(_._2 > 0)
      val pred =
        if (scores.isEmpty) "und"
        else scores.minBy { case (pl, h) => (-h, pl) }._1
      (lang, pred)
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.length.toLong) }.toSet
    val got = TextAnalysis.langIdNgram(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want, "confusion cells must equal the local recompute")
    // shares sum to 1 within each labeled language
    TextAnalysis.langIdNgram(spark, sfDir).collect()
      .groupBy(_.getString(0)).foreach { case (lang, rows) =>
        val s = rows.map(_.getDouble(3)).sum
        assert(math.abs(s - 1.0) < 1e-4, s"$lang shares must sum to 1, got $s")
      }
  }

  test("vocabOverlap: pairwise jaccard matches per-language token sets") {
    val out = TextAnalysis.vocabOverlap(spark, sfDir).collect()
    assert(out.nonEmpty)
    val vocab = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1)
      .map { case (l, rs) => l -> rs.flatMap(_._2.split(" ")).toSet }
    val langs = vocab.keys.toSeq.sorted
    val expectedPairs = (for {
      a <- langs; b <- langs if a < b
      if (vocab(a) & vocab(b)).nonEmpty
    } yield (a, b)).toSet
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet == expectedPairs)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val inter = (vocab(a) & vocab(b)).size
      val union = (vocab(a) | vocab(b)).size
      assert(r.getLong(2) == inter, s"n_common($a,$b)")
      assert(r.getLong(3) == vocab(a).size && r.getLong(4) == vocab(b).size)
      assert(math.abs(r.getDouble(5) - inter.toDouble / union) < 1e-6)
    }
  }

  test("ngramJaccard pairs never span a (lang, source) block") {
    import spark.implicits._
    // the jaccard formula itself is covered by the DuckDB oracle
    val out = Dedup.ngramJaccard(spark, sfDir, threshold = 0.0)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"))
    val joined = out
      .join(docs.select(col("doc_id").as("doc_a"), col("lang").as("la"),
        col("source").as("sa")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("lang").as("lb"),
        col("source").as("sb")), "doc_b")
    assert(joined.filter(col("la") =!= col("lb") || col("sa") =!= col("sb")).count() == 0)
  }

  test("knnBruteForce: k neighbors per query, self excluded, ranks descend by cosine") {
    val rows = Similarity.knnBruteForce(spark, sfDir, k = 5, nQueries = 3).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L))
    byQuery.values.foreach { g =>
      assert(g.length == 5)
      assert(g.forall(r => r.getLong(1) != r.getLong(0)), "self must be excluded")
      val ranked = g.sortBy(_.getLong(2))
      assert(ranked.map(_.getDouble(3)).sliding(2).forall(p => p(0) >= p(1)),
        "cosine must be non-increasing in rank")
    }
  }

  test("knnLsh returns a subset of brute-force candidates with identical scores") {
    val brute = Similarity.knnBruteForce(spark, sfDir, k = 1000, nQueries = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val lsh = Similarity.knnLsh(spark, sfDir, k = 5, nQueries = 3).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key), s"$key not in exhaustive set")
      assert(brute(key) == r.getDouble(3), s"score mismatch at $key")
    }
  }

  test("knnIvf returns a subset of brute-force candidates with identical scores") {
    val brute = Similarity.knnBruteForce(spark, sfDir, k = 1000, nQueries = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val ivf = Similarity.knnIvf(spark, sfDir, k = 5, nQueries = 3).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key), s"$key not in exhaustive set")
      assert(brute(key) == r.getDouble(3), s"score mismatch at $key")
    }
  }

  test("textStats: spot-check one document against a plain-Scala computation") {
    val doc = Tables.documents(spark, sfDir)
      .orderBy("doc_id").select("doc_id", "text").head()
    val (id, text) = (doc.getLong(0), doc.getString(1))
    val toks = text.split(" ", -1).toSeq
    val stop = Set("the", "a", "of", "and", "to", "in")
    val row = TextAnalysis.textStats(spark, sfDir)
      .filter(col("doc_id") === id).head()
    assert(row.getAs[Long]("n_tokens") == toks.size)
    assert(row.getAs[Long]("n_chars") == text.length)
    assert(row.getAs[Long]("est_bpe_tokens") == math.ceil(text.length / 4.0).toLong)
    val wantStop = BigDecimal(toks.count(stop) / toks.size.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("stop_ratio") == wantStop)
  }

  test("mediaMeta: header sniff and byte length agree with the source text") {
    val doc = Tables.documents(spark, sfDir)
      .orderBy("doc_id").select("doc_id", "text").head()
    val (id, text) = (doc.getLong(0), doc.getString(1))
    val row = Multimodal.mediaMeta(spark, sfDir)
      .filter(col("doc_id") === id).head()
    val bytes = text.getBytes("UTF-8")
    assert(row.getAs[Long]("n_bytes") == bytes.length)
    assert(row.getAs[String]("header_hex") ==
      bytes.take(8).map(b => f"$b%02x").mkString)
    val f0 = ((bytes.length * 1 + (bytes(0) & 0xff)) % 1000) / 1000.0
    assert(row.getAs[Double]("f0") ==
      BigDecimal(f0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("batched decode: fixed-size batches per partition, one feature row per payload") {
    val docs = Multimodal.withPayload(Tables.documents(spark, sfDir))
    val out = Multimodal.decodeBatched(docs, batchSize = 32).collect()
    assert(out.length == docs.count())
    val batchSizes = out.map(_.getSeq[Float](1).last.toInt)
    assert(batchSizes.forall(s => s >= 1 && s <= 32), "every batch within the size cap")
    assert(batchSizes.count(_ == 32) > batchSizes.length / 2,
      "most payloads decoded in full batches")
    // deterministic features: f0 repeats the scalar stub formula
    val row = out.minBy(_.getLong(0))
    val text = Tables.documents(spark, sfDir).orderBy("doc_id")
      .select("text").head().getString(0)
    val bytes = text.getBytes("UTF-8")
    assert(row.getSeq[Float](1).head ==
      ((bytes.length * 1 + (bytes(0) & 0xff)) % 1000) / 1000.0f)
  }

  test("exact decoder output is independent of partition layout and batch size") {
    val docs = Multimodal.withPayload(Tables.documents(spark, sfDir))
    def run(parts: Int, batchSize: Int): Map[Long, Seq[Float]] =
      Multimodal.decodeBatched(docs.repartition(parts), batchSize,
          Multimodal.exactBatchDecoder)
        .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val a = run(1, 32)
    val b = run(7, 5)
    assert(a == b, "oracle-checked compositions need layout-independent features")
    // every feature is a dyadic rational k/1024 — exact in FLOAT
    a.values.flatten.foreach { f =>
      assert(f * 1024.0f == (f * 1024.0f).round.toFloat, s"non-dyadic feature $f")
    }
  }

  test("BMP payloads survive a real javax.imageio round-trip pixel-exactly") {
    val docs = Multimodal.withBmpPayload(Tables.documents(spark, sfDir))
    // every payload is a valid 66-byte BMP container
    val p = docs.orderBy("doc_id").select("doc_id", "text", "payload").head()
    val (text, payload) = (p.getString(1), p.getAs[Array[Byte]](2))
    assert(payload.length == 66)
    assert(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte)
    // the REAL decoder: pixels back out of the codec, packed RGB / 2^24,
    // with the BMP's B,G,R byte order correctly unscrambled
    val feats = Multimodal.imageBatchDecoder(Seq(payload)).head
    val padded = text.padTo(12, ' ')
    (0 until Multimodal.NFeatures).foreach { i =>
      val (b, g, r) = (padded(3 * i).toInt, padded(3 * i + 1).toInt, padded(3 * i + 2).toInt)
      assert(feats(i) == ((r << 16 | g << 8 | b) / 16777216.0f),
        s"pixel $i channel order or row orientation wrong")
    }
    // non-image payloads fail loudly, not as silent zero features
    intercept[IllegalArgumentException] {
      Multimodal.imageBatchDecoder(Seq("not an image".getBytes("UTF-8")))
    }
    // decodePayload is the same real decoder, single-payload form
    assert(Multimodal.decodePayload(payload).toSeq == feats.toSeq)
  }

  test("frame sampling slices the binary payload into strided fixed-size frames") {
    val docs = Multimodal.withPayload(Tables.documents(spark, sfDir))
    val doc = docs.orderBy("doc_id").select("doc_id", "text").head()
    val (id, text) = (doc.getLong(0), doc.getString(1))
    val frames = Multimodal.sampleFrames(docs, frameBytes = 64, stride = 4)
      .filter(col("doc_id") === id).orderBy("frame_idx").collect()
    val bytes = text.getBytes("UTF-8")
    val nFrames = (bytes.length + 63) / 64
    assert(frames.map(_.getLong(1)).toSeq ==
      (0 until nFrames by 4).map(_.toLong), "every 4th frame index")
    val f0 = frames.head.getAs[Array[Byte]]("frame")
    assert(f0.toSeq == bytes.take(64).toSeq, "frame 0 is the first 64 payload bytes")
  }

  test("decodePayload rejects non-image bytes loudly (real codec, no silent zeros)") {
    // since r8 decodePayload is the REAL javax.imageio path (see the
    // BMP round-trip test); undecodable bytes must fail, not fake
    intercept[IllegalArgumentException] { Multimodal.decodePayload(Array[Byte](1, 2)) }
  }

  test("frameDedup conserves counts: dups == sampled frames minus distinct fingerprints") {
    val frames = Multimodal.sampleFrames(
      Multimodal.withPayload(Tables.documents(spark, sfDir)), 64, 4)
    val nSampled = frames.count()
    val nDistinct = frames.select(md5(col("frame"))).distinct().count()
    val out = Multimodal.frameDedup(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("n_frames")).sum == nSampled)
    assert(out.map(_.getAs[Long]("n_dup_frames")).sum == nSampled - nDistinct)
    out.foreach { r =>
      assert(r.getAs[Long]("n_dup_frames") <= r.getAs[Long]("n_frames"))
    }
  }

  test("bag set ops: exceptAll/intersectAll multiplicities are max(0,p-v)/min(p,v)") {
    val ev = Tables.events(spark, sfDir)
    def counts(t: String): Map[Long, Long] = ev
      .filter(col("event_type") === t).groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (p, v) = (counts("purchase"), counts("view"))
    val surplus = Analytics.purchaseSurplus(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_surplus")).toMap
    val expSurplus = p.map { case (u, n) => u -> (n - v.getOrElse(u, 0L)) }
      .filter(_._2 > 0)
    assert(surplus == expSurplus, "EXCEPT ALL multiplicity")
    val common = Analytics.purchaseViewOverlap(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_common")).toMap
    val expCommon = p.map { case (u, n) => u -> math.min(n, v.getOrElse(u, 0L)) }
      .filter(_._2 > 0)
    assert(common == expCommon, "INTERSECT ALL multiplicity")
  }

  test("scd2: per-key versions chain (valid_to == next valid_from), one current row") {
    val rows = Analytics.scd2UserValue(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("version"),
        r.getAs[java.sql.Timestamp]("valid_from"),
        r.getAs[java.sql.Timestamp]("valid_to"),
        r.getAs[Boolean]("is_current")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (user, history) =>
      val h = history.sortBy(_._2)
      assert(h.map(_._2).toSeq == (1L to h.length).toSeq, s"user $user versions dense")
      h.sliding(2).foreach {
        case Array((_, _, _, to, _), (_, _, from, _, _)) =>
          assert(to == from, s"user $user interval chain broken")
        case _ =>
      }
      assert(h.count(_._5) == 1 && h.last._5, s"user $user: exactly the last row is current")
      assert(h.init.forall(_._4 != null), s"user $user: only the current row is open")
    }
  }

  test("interval join equals the brute-force pair scan within the hour window") {
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[java.sql.Timestamp](3).getTime))
    val views = ev.filter(_._3 == "view")
    val purchases = ev.filter(_._3 == "purchase")
    val hour = 3600L * 1000
    val pairs = for {
      (u, vid, _, vts) <- views
      (pu, pid, _, pts) <- purchases
      if pu == u && pts >= vts && pts < vts + hour
    } yield (u, vid, pid)
    val expect = pairs.groupBy(_._1).map { case (u, ps) =>
      u -> (ps.length.toLong, ps.map(_._2).distinct.length.toLong,
            ps.map(_._3).distinct.length.toLong)
    }
    val got = Analytics.viewToPurchaseWithinHour(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_attributed_views"), r.getAs[Long]("n_attributed_purchases")))
      .toMap
    assert(got == expect)
  }

  test("zscore outliers match a plain-Scala recount against the ROUNDED bounds") {
    val rows = Analytics.zscoreOutliers(spark, sfDir).collect()
    val ev = Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    rows.foreach { r =>
      val t = r.getString(0)
      val (mean, std) = (r.getAs[Double]("mean_v"), r.getAs[Double]("std_v"))
      val vals = ev.filter(_._1 == t).map(_._2)
      assert(r.getAs[Long]("n_events") == vals.length)
      assert(r.getAs[Long]("n_high_outliers") == vals.count(_ > mean + 3.0 * std), t)
      assert(r.getAs[Long]("n_low_outliers") == vals.count(_ < mean - 3.0 * std), t)
    }
  }

  test("LOCF carries the last observed hourly average across empty hours") {
    val rows = Analytics.hourlyValueLocf(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("hour"),
        Option(r.getAs[java.lang.Double]("filled_value")).map(_.toDouble),
        r.getAs[Boolean]("is_filled")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, series) =>
      val s = series.sortBy(_._2.getTime)
      var lastObserved: Option[Double] = None
      s.foreach { case (_, _, filled, isFilled) =>
        if (!isFilled) {
          assert(filled.isDefined, s"$t observed hour must carry its own value")
          lastObserved = filled
        } else {
          assert(filled == lastObserved, s"$t filled hour must carry the last observation")
        }
      }
    }
  }

  test("vocabCoverage: totals match the corpus, rank90 covers >= 90% when rescanned") {
    val out = TextAnalysis.vocabCoverage(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    out.foreach { r =>
      val lang = r.getString(0)
      val toks = docs.filter(_._1 == lang).flatMap(_._2)
      assert(r.getAs[Long]("total_occ") == toks.length, s"$lang total occurrences")
      assert(r.getAs[Long]("vocab_size") == toks.distinct.length, s"$lang vocab size")
      val rank90 = r.getAs[Long]("rank90")
      assert(rank90 >= 1 && rank90 <= r.getAs[Long]("vocab_size"))
      // recompute: the top-rank90 tokens really cover >= 90%, and one
      // fewer does not (minimality)
      val byCount = toks.groupBy(identity).map { case (t, o) => (t, o.size.toLong) }
        .toSeq.sortBy { case (t, c) => (-c, t) }
      val cum = byCount.map(_._2).scanLeft(0L)(_ + _).drop(1)
      assert(cum(rank90.toInt - 1) * 10 >= toks.length.toLong * 9, s"$lang rank90 covers")
      if (rank90 > 1)
        assert(cum(rank90.toInt - 2) * 10 < toks.length.toLong * 9, s"$lang rank90 minimal")
    }
  }

  test("vocabCoverage: a too-small head falls back per language with identical output") {
    // headK=1 covers ~4% of occurrences, nowhere near 90% — every
    // language is forced onto the phase-2 full-vocabulary fallback,
    // which must be output-identical to the fast head path
    val fast = TextAnalysis.vocabCoverage(spark, sfDir).collect().map(_.toSeq).toSeq
    val fellBack = TextAnalysis.vocabCoverage(spark, sfDir, headK = 1)
      .collect().map(_.toSeq).toSeq
    assert(fellBack == fast, "fallback path must be output-invariant")
    Caches.releaseAll(spark)
  }

  test("heavyHitterTokens: counts descend with rank, share is occ over ALL tokens") {
    val rows = TextAnalysis.heavyHitterTokens(spark, sfDir, k = 10)
      .orderBy("rk").collect()
    assert(rows.length == 10)
    val occs = rows.map(_.getAs[Long]("n_occ")).toSeq
    assert(occs == occs.sortBy(-_), "n_occ must not increase with rank")
    // share denominator is the FULL corpus token count, not the top-k sum
    val totalTokens = Tables.documents(spark, sfDir)
      .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    rows.foreach { r =>
      val want = BigDecimal(r.getAs[Long]("n_occ").toDouble / totalTokens)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("share") == want, s"share mismatch at rk=${r.getAs[Long]("rk")}")
      assert(r.getAs[Long]("n_docs") <= r.getAs[Long]("n_occ"))
    }
  }

  test("histogramBin floors for negative values (oracle-portable division semantics)") {
    // the corpus pins value >= 0.01, where floor and truncate agree —
    // this probe feeds the expression NEGATIVE values so a regression
    // back to bare `div`/`//` (which disagree below zero) fails loudly
    import spark.implicits._
    val got = Seq(-45.0, -0.01, 0.0, 0.01, 45.0).toDF("value")
      .select(Analytics.histogramBin.as("bin")).as[Long].collect().toSeq
    assert(got == Seq(-3L, -1L, 0L, 0L, 2L),
      s"expected floor(cents/2000) semantics, got $got")
  }

  test("langConfusion: cells partition the corpus and shares sum to 1 per label") {
    val out = TextAnalysis.langConfusion(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == nDocs, "cells must partition the corpus")
    out.groupBy(_.getString(0)).foreach { case (lang, cells) =>
      val s = cells.map(_.getAs[Double]("lang_share")).sum
      assert(math.abs(s - 1.0) < 1e-5, s"$lang shares sum to $s")
    }
  }

  test("zorderSkipping: the read ladder holds — zorder < single-dim sort < natural") {
    val rows = Analytics.zorderSkipping(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq("bypart", "natural", "zorder"))
    val total = Tables.lineitem(spark, sfDir).count()
    val Array(by, nat, zo) = rows
    // insertion order clusters neither dimension: nothing prunes
    assert(nat._2 == 64 && nat._3 == 64 && nat._4 == total,
      s"natural layout must read everything, got $nat")
    // one sorted dimension prunes its range; the curve prunes BOTH
    assert(by._4 < nat._4, s"single-dim sort must prune rows, got $by")
    assert(zo._4 < by._4, s"z-order must beat the single-dim sort: $zo vs $by")
    rows.foreach { case (layout, nShards, read, scanned, frac) =>
      assert(read <= nShards && scanned <= total, s"$layout books don't balance")
      val expect = BigDecimal(scanned.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(frac - expect) < 1e-9, s"$layout read_frac drifted")
    }
  }

  test("substringDedup: hand-built spans — merge, adjacency-touch, and gap-break") {
    import spark.implicits._
    def toks(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i")
    val a = toks("a", 8); val b = toks("b", 8); val u = toks("x", 9)
    val docs = Seq(
      // doc1 ⊂ doc2: one contiguous duplicated region in each
      (1L, "a b c d e f g h i j"),
      (2L, "z z a b c d e f g h i j"),
      (3L, "q w e r t y u i o p"), // unique: must be absent
      // doc4 has A..(9 unique)..B — dup positions 1 and 18, gap 17 > 8
      // breaks into TWO spans of 8; doc5 = A ++ B back-to-back — dup
      // positions 1 and 9, gap exactly 8 TOUCHES, merging to ONE span
      (4L, (a ++ u ++ b).mkString(" ")),
      (5L, (a ++ b).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.substringDedupFrom(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L))
    assert(out(1L) == ((10L, 1L, 10L, 1.0)), s"doc1: ${out(1L)}")
    assert(out(2L) == ((12L, 1L, 10L, 0.833333)), s"doc2: ${out(2L)}")
    assert(out(4L) == ((25L, 2L, 16L, 0.64)), s"doc4: ${out(4L)}")
    assert(out(5L) == ((16L, 1L, 16L, 1.0)), s"doc5: ${out(5L)}")
  }

  test("substringDedup: corpus invariants — spans fit inside their documents") {
    val rows = Dedup.substringDedup(spark, sfDir).collect()
    assert(rows.nonEmpty, "planted near-dups share verbatim 8-token spans")
    rows.foreach { r =>
      val (total, nSpans, dup, share) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nSpans >= 1 && dup >= Dedup.SpanGramN, s"degenerate span: $r")
      assert(dup <= total, s"span coverage exceeds the document: $r")
      // k merged spans are k disjoint regions of >= 8 tokens each
      assert(dup >= nSpans * Dedup.SpanGramN, s"islands too small: $r")
      val expect = BigDecimal(dup.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(share - expect) < 1e-9, s"share drifted: $r")
    }
  }

  test("langIdHoldout: cells partition the held-out split, shares sum to 1") {
    import org.apache.spark.sql.functions.{call_function, col, lit, pmod}
    val rows = TextAnalysis.langIdHoldout(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    graft.functions.PolyHash.register(spark)
    val heldOut = Tables.documents(spark, sfDir)
      .filter(pmod(call_function(graft.functions.PolyHash.Name,
        col("doc_id").cast("string")), lit(10)) >= 8)
      .count()
    assert(rows.map(_._3).sum == heldOut,
      s"confusion cells must partition the ${heldOut}-doc held-out split")
    rows.groupBy(_._1).foreach { case (lang, cells) =>
      val s = cells.map(_._4).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$lang shares sum to $s")
    }
  }

  test("substringStrip: exactly one copy of every duplicated gram survives") {
    import spark.implicits._
    def toks(prefix: String, n: Int) = (1 to n).map(i => s"$prefix$i")
    val a = toks("a", 8); val b = toks("b", 8); val u = toks("x", 9)
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "z z a b c d e f g h i j"),
      (3L, "q w e r t y u i o p"),
      (4L, (a ++ u ++ b).mkString(" ")),
      (5L, (a ++ b).mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.substringStripFrom(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // docs 1 and 4 hold every canonical (min doc_id) occurrence and
    // keep all their tokens; docs 2 and 5 lose their whole shared span
    assert(out.keySet == Set(2L, 5L), s"strip hit the canonicals: $out")
    assert(out(2L) == ((12L, 10L, 2L, 0.833333)), s"doc2: ${out(2L)}")
    assert(out(5L) == ((16L, 16L, 0L, 1.0)), s"doc5: ${out(5L)}")
    // strip is priced within the report's coverage: removed <= dup'd
    val report = Dedup.substringDedupFrom(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    out.foreach { case (d, (_, removed, _, _)) =>
      assert(removed <= report(d), s"doc $d removes more than is duplicated")
    }
  }

  test("substringStrip: corpus invariants — the edit books balance") {
    val rows = Dedup.substringStrip(spark, sfDir).collect()
    assert(rows.nonEmpty, "planted near-dups have non-canonical copies")
    rows.foreach { r =>
      val (total, removed, kept, share) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(removed >= Dedup.SpanGramN && removed + kept == total, s"books: $r")
      val expect = BigDecimal(removed.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(share - expect) < 1e-9, s"share drifted: $r")
    }
  }

  test("spanReport island arithmetic matches a pure-Scala interval merge (randomized)") {
    import spark.implicits._
    // reference: merge [p, p+7] coverage, islands break when the
    // position gap exceeds 8 (touching regions merge)
    def ref(positions: Seq[Int]): (Long, Long) = {
      val sorted = positions.distinct.sorted
      val islands = sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p - e <= Dedup.SpanGramN => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }
      (islands.size.toLong,
       islands.map { case (s, e) => (e - s + Dedup.SpanGramN).toLong }.sum)
    }
    val rnd = new scala.util.Random(42)
    val docs = (1L to 200L).map { d =>
      val n = 1 + rnd.nextInt(12)
      d -> Seq.fill(n)(1 + rnd.nextInt(60)).distinct
    }
    val hits = docs.flatMap { case (d, ps) => ps.map(p => (d, p)) }
      .toDF("doc_id", "pos")
    val totals = docs.map { case (d, ps) => (d, (ps.max + 100).toLong) }
      .toDF("doc_id", "total_tokens")
    val got = Dedup.spanReport(hits, totals).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    docs.foreach { case (d, ps) =>
      assert(got(d) == ref(ps), s"doc $d positions ${ps.sorted}: ${got(d)} vs ${ref(ps)}")
    }
    // pinned edges: touch merges (gap 8), gap 9 breaks
    val edge = Seq((900L, 1), (900L, 9), (901L, 1), (901L, 10))
      .toDF("doc_id", "pos")
    val edgeTotals = Seq((900L, 50L), (901L, 50L)).toDF("doc_id", "total_tokens")
    val e = Dedup.spanReport(edge, edgeTotals).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(e(900L) == ((1L, 16L)), s"touching regions must merge: ${e(900L)}")
    assert(e(901L) == ((2L, 16L)), s"gap 9 must break: ${e(901L)}")
  }

  test("substringHotspots: 8-token grams, descending reach, text rescans true") {
    val rows = Dedup.substringHotspots(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty, "planted near-dups share spans")
    assert(rows.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)),
      "n_docs must descend")
    val texts = Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    rows.foreach { case (_, gram, nDocs, nOcc) =>
      assert(gram.split(" ").length == Dedup.SpanGramN, s"not 8 tokens: '$gram'")
      assert(nDocs >= 2 && nOcc >= nDocs, s"reach books don't balance: $gram")
      // substring containment is a superset of token-aligned occurrence
      val containing = texts.count(_.contains(gram))
      assert(containing >= nDocs, s"'$gram' claims $nDocs docs, found $containing")
    }
  }
}
