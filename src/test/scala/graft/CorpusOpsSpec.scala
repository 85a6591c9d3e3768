package graft

import graft.functions.PolyHash
import graft.operators.CorpusOps

/** Invariants of the corpus-curation operators beyond the DuckDB
  * oracle row-hash (which pins exact values at sf0.01): determinism
  * against an in-Scala reimplementation, and the structural bounds
  * every output row must satisfy at any scale.
  */
class CorpusOpsSpec extends SparkSuite {

  test("stratified sample equals the in-Scala hash gate (reproducible, layout-free)") {
    val got = CorpusOps.stratifiedSample(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = all.collect {
      case (id, lang) if PolyHash.hash(id.toString) % 100 <
        (if (lang == "en") 10 else 50) => id
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty && got.size < all.length, "sample is proper and non-empty")
  }

  test("domain cap keeps at most `cap` docs per source, the hash-smallest ones") {
    val cap = 3
    val rows = CorpusOps.domainCap(spark, sfDir, cap = cap).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = rows.groupBy(_._1)
    val all = graft.Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    bySource.foreach { case (src, rs) =>
      assert(rs.length <= cap, s"$src over cap")
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, s"$src ranks dense")
      // kept set == the cap hash-smallest (hash, doc_id) of that source
      val expect = all.filter(_._2 == src)
        .map { case (id, _) => (PolyHash.hash(id.toString), id) }
        .sorted.take(cap).map(_._2).toSet
      assert(rs.map(_._3).toSet == expect, s"$src kept the wrong docs")
    }
    // every source with documents appears
    assert(bySource.keySet == all.map(_._2).toSet)
  }

  test("training order is a bijection onto dense (shard, pos) addresses in hash order") {
    val shards = 4
    val rows = CorpusOps.trainingOrder(spark, sfDir, shards = shards).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.length == nDocs, "every doc gets exactly one address")
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(shard >= 0 && shard < shards)
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq, s"shard $shard dense")
      // position order within the shard follows (hash, doc_id) order
      val inHashOrder = rs.sortBy(_._3)
        .map { case (id, _, _) => (PolyHash.hash(id.toString), id) }
      assert(inHashOrder.toSeq == inHashOrder.sorted.toSeq, s"shard $shard not hash-ordered")
      rs.foreach { case (id, s, _) =>
        assert(PolyHash.hash(id.toString) % shards == s, s"doc $id in wrong shard")
      }
    }
  }

  test("epoch mix replicates non-en docs 3x and shares sum to 1") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select("lang").collect().map(_.getString(0))
    val out = CorpusOps.epochMix(spark, sfDir).collect()
    out.foreach { r =>
      val (lang, nDocs, nCopies) =
        (r.getString(0), r.getAs[Long]("n_docs"), r.getAs[Long]("n_copies"))
      val rep = if (lang == "en") 1 else 3
      assert(nCopies == nDocs * rep, s"$lang replication factor")
      assert(nDocs == docs.count(_ == lang), s"$lang doc count")
    }
    val shareSum = out.map(_.getAs[Double]("mix_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"mix shares sum to $shareSum")
  }

  test("quality filter keeps a bounded fraction per stratum") {
    val rows = CorpusOps.qualityFilter(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, kept, rate) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(kept >= 0 && kept <= n, s"kept $kept out of $n")
      assert(rate >= 0.0 && rate <= 1.0)
    }
  }

  test("decontamination flags only corpus docs, with shared <= total grams") {
    val rows = CorpusOps.decontaminate(spark, sfDir).collect()
    assert(rows.nonEmpty, "synthetic corpus contains near-dups of the benchmark docs")
    rows.foreach { r =>
      assert(r.getLong(0) >= 20, "benchmark docs must not flag themselves")
      assert(r.getLong(2) <= r.getLong(1), "shared grams bounded by the doc's grams")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("per-benchmark contamination audit is consistent with the corpus-side pass") {
    val byBench = CorpusOps.contaminationByBench(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(byBench.nonEmpty)
    byBench.foreach { case (id, nGrams, hitDocs, hitGrams, ratio) =>
      assert(id < 20, "only benchmark docs appear")
      assert(hitGrams <= nGrams, "leaked grams bounded by the doc's grams")
      assert((hitDocs == 0) == (hitGrams == 0), "doc hits iff gram hits")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // the two directions must agree on WHETHER contamination exists
    val corpusSide = CorpusOps.decontaminate(spark, sfDir).collect()
    assert(corpusSide.nonEmpty == byBench.exists(_._3 > 0),
      "corpus-side and bench-side audits disagree on contamination presence")
  }

  test("distributed global rank equals the single-node sort index") {
    import org.apache.spark.sql.functions.col
    val stats = graft.operators.TextAnalysis.textStats(spark, sfDir)
      .select("doc_id", "quality")
    val (ranked, total) = CorpusOps.withGlobalRank(stats,
      Seq(col("quality").desc, col("doc_id")), "rn")
    val got = ranked.select("doc_id", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val local = stats.collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, q) => (-q, id) }
      .zipWithIndex.map { case ((id, _), i) => (id, i + 1L) }.toMap
    assert(total == local.size.toLong)
    assert(got == local, "rank must equal the global sort position")
  }

  test("quality deciles: even bins, dense ids, monotone quality boundaries") {
    val rows = CorpusOps.qualityDeciles(spark, sfDir).collect()
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "bins partition the corpus")
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length), "dense decile ids")
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"uneven bins: ${sizes.toSeq}")
    // ranking is quality-DESC: each bin's floor >= the next bin's
    // ceiling (equal exactly when a tie spans the boundary)
    rows.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(hi.getDouble(2) >= lo.getDouble(3),
          s"decile ${hi.getLong(0)} min < decile ${lo.getLong(0)} max")
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(4) + 1e-9 && r.getDouble(4) <= r.getDouble(3) + 1e-9,
        "avg within [min, max]")
    }
  }

  test("curation funnel: monotone stage counts anchored to the standalone passes") {
    val rows = CorpusOps.curationFunnel(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to 5L), "dense ordered stage ids")
    val counts = rows.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"stages must only shrink: ${counts.toSeq}")
    val nRaw = graft.Tables.documents(spark, sfDir).count()
    assert(counts.head == nRaw, "stage 1 is the raw corpus")
    val nQuality = graft.Tables.documents(spark, sfDir)
      .filter(CorpusOps.qualityKeep).count()
    assert(counts(1) == nQuality, "stage 2 equals the standalone quality gate")
    rows.foreach { case (_, _, n, ret) =>
      assert(math.abs(ret - n.toDouble / nRaw) < 1e-6)
    }
    assert(counts.last > 0, "funnel must not empty the corpus")
    assert(counts.last < nRaw, "funnel must actually cut")
  }

  test("js divergence: all source pairs, bounded by ln 2, matches the in-Scala recompute") {
    val rows = CorpusOps.jsBetweenSources(spark, sfDir).collect()
    val sources = graft.Tables.documents(spark, sfDir)
      .select("source").distinct().count().toInt
    assert(rows.length === sources * (sources - 1) / 2)
    val ln2 = math.log(2.0)
    rows.foreach { r =>
      val js = r.getAs[Double]("js_divergence")
      assert(js >= -1e-9 && js <= ln2 + 1e-9, s"$r")
    }
    // exact recompute of one pair from collected (source, lang) counts
    val cells = graft.Tables.documents(spark, sfDir)
      .groupBy("source", "lang").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val (sa, sb) = (rows.head.getAs[String]("source_a"),
                    rows.head.getAs[String]("source_b"))
    val na = cells.collect { case ((s, _), c) if s == sa => c }.sum.toDouble
    val nb = cells.collect { case ((s, _), c) if s == sb => c }.sum.toDouble
    val langs = cells.keysIterator.map(_._2).toSet
    def side(p: Double, q: Double) =
      if (p > 0) p * math.log(2.0 * p / (p + q)) else 0.0
    val expected = langs.toSeq.map { l =>
      val pa = cells.getOrElse((sa, l), 0L) / na
      val pb = cells.getOrElse((sb, l), 0L) / nb
      side(pa, pb) / 2 + side(pb, pa) / 2
    }.sum
    assert(math.abs(rows.head.getAs[Double]("js_divergence") - expected) < 1e-6)
  }

  test("novelty curve: first-in-order copy is novel, replicas fully seen; corpus conserves") {
    import spark.implicits._
    // four identical docs: exactly one band (the training-order first)
    // reads dup_share 0, the other three read 1.0
    val text = "w1 w2 w3 w4 w5 w6"
    val d = (1 to 4).map(i => (i.toLong, text, "en", "web", 17L))
    val dir = java.nio.file.Files.createTempDirectory("novel").toString
    d.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusOps.noveltyCurve(spark, dir).collect()
    assert(rows.length === 4)
    val shares = rows.map(_.getAs[Double]("dup_share")).sorted.toSeq
    assert(shares === Seq(0.0, 1.0, 1.0, 1.0))
    assert(rows.map(_.getAs[Long]("grams")).sum === 16L) // 4 grams x 4 docs
    // corpus: bands in [1, 10]; every gram's first exposure is unseen
    val corpus = CorpusOps.noveltyCurve(spark, sfDir).collect()
    assert(corpus.nonEmpty && corpus.length <= 10)
    corpus.foreach { r =>
      val b = r.getAs[Long]("band")
      assert(b >= 1L && b <= 10L)
      assert(r.getAs[Long]("seen_before") <= r.getAs[Long]("grams"))
    }
    assert(corpus.map(_.getAs[Long]("seen_before")).sum <
      corpus.map(_.getAs[Long]("grams")).sum)
  }

  test("hill diversity: uniform mix reads every order equal to richness; orders nest") {
    import spark.implicits._
    // 4 languages x 3 docs each: hill_1 = inv_simpson = richness = 4
    val d = (1 to 12).map(i => (i.toLong, "x", s"l${i % 4}", "web", 1L))
    val dir = java.nio.file.Files.createTempDirectory("hill").toString
    d.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = CorpusOps.hillDiversity(spark, dir).head()
    assert(r.getAs[Long]("richness") === 4L)
    assert(math.abs(r.getAs[Double]("hill_1") - 4.0) < 1e-4)
    assert(r.getAs[Double]("inv_simpson") === 4.0)
    // corpus: the Hill order inequality 1 <= invSimpson <= hill_1 <= richness
    CorpusOps.hillDiversity(spark, sfDir).collect().foreach { row =>
      val (rich, h1, is) = (row.getAs[Long]("richness").toDouble,
        row.getAs[Double]("hill_1"), row.getAs[Double]("inv_simpson"))
      assert(is >= 1.0 - 1e-6 && is <= h1 + 1e-4 && h1 <= rich + 1e-4, row.toString)
    }
  }

  test("ks lengths: disjoint length distributions read D = 1 at the split point") {
    import spark.implicits._
    val d = (1 to 6).map(i => (i.toLong, "x", "en",
      if (i <= 3) "web" else "chat", if (i <= 3) 10L else 20L))
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    d.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = CorpusOps.ksLengths(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows.size === 2)
    Seq("web", "chat").foreach { s =>
      assert(rows(s).getAs[Double]("ks_stat") === 1.0, s)
      assert(rows(s).getAs[Long]("split_length") === 10L,
        "sup is reached first at the shorter mass")
      assert(rows(s).getAs[Long]("n_docs") === 3L)
    }
    // identical distributions -> D = 0 (argmax tie -> smallest length)
    val same = (1 to 6).map(i => (i.toLong, "x", "en",
      if (i % 2 == 0) "a" else "b", (i % 3).toLong * 5))
    val dir2 = java.nio.file.Files.createTempDirectory("ks2").toString
    same.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    CorpusOps.ksLengths(spark, dir2).collect().foreach { r =>
      assert(r.getAs[Double]("ks_stat") === 0.0, r.toString)
    }
    // corpus: the statistic is a probability-scale sup in [0, 1]
    CorpusOps.ksLengths(spark, sfDir).collect().foreach { r =>
      val k = r.getAs[Double]("ks_stat")
      assert(k >= 0.0 && k <= 1.0, r.toString)
    }
  }

  test("shard skew recomputes locally; load factors average to balance") {
    val rows = CorpusOps.shardSkew(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val local = docs.groupBy { case (id, _) => PolyHash.hash(id.toString) % 8 }
      .map { case (s, ds) => (s, ds.length.toLong, ds.map(_._2.split(" ").length.toLong).sum) }
    rows.foreach { case (shard, nDocs, nTok, docLoad, tokLoad) =>
      val (_, ln, lt) = local.find(_._1 == shard).get
      assert(nDocs == ln && nTok == lt, s"shard $shard counts")
      assert(math.abs(docLoad - nDocs.toDouble * 8 / docs.length) < 1e-6)
      val totalTok = local.map(_._3).sum
      assert(math.abs(tokLoad - nTok.toDouble * 8 / totalTok) < 1e-6)
    }
    assert(rows.map(_._2).sum == docs.length, "shards partition the corpus")
  }

  test("temperature mix: weights recompute locally and rebalance toward rare languages") {
    val rows = CorpusOps.temperatureMix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    rows.foreach { case (lang, n, share, weight, boost) =>
      assert(math.abs(share - n.toDouble / total) < 1e-6, s"$lang share")
      assert(math.abs(boost - weight / share) < 1e-4, s"$lang boost")
    }
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "shares sum to 1")
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "weights sum to 1")
    // alpha = 1/2 flattens the mix: dominant damped, rarest boosted
    val dominant = rows.maxBy(_._2)
    val rarest = rows.minBy(_._2)
    if (dominant._2 > rarest._2) {
      assert(dominant._5 < 1.0, s"dominant ${dominant._1} not damped")
      assert(rarest._5 > 1.0, s"rarest ${rarest._1} not boosted")
    }
  }

  test("tf-idf emits a full descending top-k per language") {
    val rows = CorpusOps.tfidfTopTerms(spark, sfDir, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to 5L), s"$lang ranks: ${rs.map(_._2).toSeq}")
      val scores = rs.sortBy(_._2).map(_._3)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$lang scores not descending: ${scores.toSeq}")
    }
  }

  test("chunking covers every document with overlapping fixed-stride windows") {
    val tokCounts = graft.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val chunks = CorpusOps.docChunks(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(chunks.map(_._1).toSet == tokCounts.keySet, "every doc chunks")
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = tokCounts(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until cs.length),
        s"doc $doc chunk indices not contiguous")
      // all chunks full-width except possibly the last; the last covers
      // exactly the tail past the final stride
      assert(sorted.init.forall(_._3 == CorpusOps.ChunkTokens.toLong))
      val last = sorted.last
      assert(last._3 == n - last._2 * CorpusOps.ChunkStride && last._3 >= 1 &&
        last._3 <= CorpusOps.ChunkTokens, s"doc $doc last chunk ${last._3}")
      // windows must cover the whole token range (stride < width -> overlap)
      assert(last._2 * CorpusOps.ChunkStride + last._3 == n, s"doc $doc tail uncovered")
    }
  }

  test("chunk dedup conserves counts: total dups == total chunks - distinct fps") {
    val chunks = CorpusOps.docChunks(spark, sfDir)
      .select("chunk_fp").collect().map(_.getLong(0))
    val rows = CorpusOps.chunkDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._2).sum == chunks.length, "every chunk accounted for")
    assert(rows.map(_._3).sum == chunks.length - chunks.distinct.length,
      "one original per distinct fingerprint, the rest dups")
    rows.foreach { case (doc, n, dups, ratio) =>
      assert(dups <= n && math.abs(ratio - dups.toDouble / n) < 1e-9, s"doc $doc")
    }
  }

  test("packing partitions each language stream and conserves tokens") {
    val docs = graft.Tables.documents(spark, sfDir)
      .selectExpr("lang", "size(split(text, ' ')) AS n").collect()
      .map(r => r.getString(0) -> r.getInt(1).toLong)
    val packs = CorpusOps.docPacking(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byLang = packs.groupBy(_._1)
    assert(byLang.keySet == docs.map(_._1).toSet)
    byLang.foreach { case (lang, rs) =>
      val expectDocs = docs.count(_._1 == lang)
      val expectToks = docs.filter(_._1 == lang).map(_._2).sum
      assert(rs.map(_._3).sum == expectDocs, s"$lang doc count conserved")
      assert(rs.map(_._4).sum == expectToks, s"$lang token count conserved")
      rs.foreach { case (_, seqId, nDocs, _, straddlers) =>
        assert(seqId >= 0 && straddlers >= 0 && straddlers <= nDocs)
      }
      // the last sequence id matches the total stream length
      assert(rs.map(_._2).max <= expectToks / CorpusOps.SeqLen)
    }
  }

  test("split leakage: sizes partition the corpus, by_root crosses zero, by_doc recomputes locally") {
    val nDocs = graft.Tables.documents(spark, sfDir).count()
    val rows = CorpusOps.splitLeakage(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == Seq("by_doc", "by_root"))
    rows.foreach { case (scheme, tr, va, te, _) =>
      assert(tr + va + te == nDocs, s"$scheme splits must partition the corpus")
    }
    // group-consistent assignment cannot cross: every near-dup pair
    // shares a component root, so both ends hash identically
    val byRoot = rows.find(_._1 == "by_root").get
    assert(byRoot._5 == 0L, "by_root must have zero crossing pairs")
    // naive by_doc scheme recomputes locally from the pair set + hash
    val pairs = graft.operators.Dedup.nearDupMinhash(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def split(id: Long): String = {
      val b = PolyHash.hash(id.toString) % 10
      if (b < 8) "train" else if (b == 8) "val" else "test"
    }
    val byDoc = rows.find(_._1 == "by_doc").get
    assert(byDoc._5 == pairs.count { case (a, b) => split(a) != split(b) },
      "by_doc crossing count must match the local recompute")
    assert(byDoc._5 > 0L,
      "the planted near-dup clusters must actually demonstrate leakage")
    val all = graft.Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    assert(byDoc._2 == all.count(split(_) == "train"), "by_doc train size")
    assert(byDoc._3 == all.count(split(_) == "val"), "by_doc val size")
  }

  test("contamination sweep: bands within [0,9], per-size doc accounting, monotone hardening") {
    import org.apache.spark.sql.functions._
    val sweep = graft.operators.CorpusOps.contaminationSweep(spark, sfDir).collect()
    assert(sweep.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 9))
    val docs = graft.Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).as("nt"), col("doc_id"))
      .filter(col("doc_id") >= 20)
    for (n <- Seq(4, 8, 13)) {
      val expected = docs.filter(col("nt") >= n).count()
      val got = sweep.filter(_.getLong(0) == n).map(_.getLong(2)).sum
      assert(got === expected, s"gram_n=$n doc accounting")
    }
    // hardening the operating point cannot RAISE total shared mass:
    // every shared 13-gram contains shared 8-grams and 4-grams
    def mass(n: Int) = sweep.filter(_.getLong(0) == n).map(_.getLong(3)).sum
    assert(mass(13) <= mass(8) && mass(8) <= mass(4),
      s"shared-gram mass should shrink as grams harden: ${mass(4)}/${mass(8)}/${mass(13)}")
  }
}
