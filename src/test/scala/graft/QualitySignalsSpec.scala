package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Hand-computed coverage for the r8 quality-signal wave: bigram LM
  * perplexity, character entropy, count-min error audit. The oracle
  * pins engine-vs-DuckDB determinism on the real corpus; these pin the
  * MATH on crafted inputs where the expected value is known in closed
  * form.
  */
class QualitySignalsSpec extends SparkSuite {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("bigramPerplexity: hand-computed add-1 LM on a two-doc corpus") {
    // docs: "a b a", "b b".
    // pairs: (<s>,a)(a,b)(b,a) | (<s>,b)(b,b); V = |{a,b}| = 2
    // cu: <s>=2, a=1, b=2
    // P(<s>→a) = (1+1)/(2+2) = .5        nll = ln 2      = 0.693147
    // P(a→b)   = (1+1)/(1+2) = 2/3       nll = ln 1.5    = 0.405465
    // P(b→a)   = (1+1)/(2+2) = .5        nll = 0.693147
    // P(<s>→b) = (1+1)/(2+2) = .5        nll = 0.693147
    // P(b→b)   = (1+1)/(2+2) = .5        nll = 0.693147
    val got = TextAnalysis.bigramPerplexityFrom(docs("a b a", "b b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val avg1 = BigDecimal((0.693147 + 0.405465 + 0.693147) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val avg2 = 0.693147
    def pplOf(a: Double) = BigDecimal(math.exp(a))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      (0L, 3L, avg1, pplOf(avg1)),
      (1L, 2L, avg2, pplOf(avg2))))
  }

  test("bigramPerplexity: every token position is scored (join totality)") {
    val df = TextAnalysis.bigramPerplexity(spark, sfDir)
    val both = TextAnalysis.textStats(spark, sfDir).select("doc_id", "n_tokens")
      .join(df, Seq("doc_id"), "full_outer")
    assert(both.filter(col("n_tokens").isNull || col("n_scored").isNull ||
      col("n_tokens") =!= col("n_scored")).count() == 0)
    // add-1 smoothing caps any conditional at < 1 → nll > 0 → ppl > 1
    assert(df.filter(col("avg_nll") <= 0 || col("ppl") <= 1).count() == 0)
  }

  test("bigramScore against the self-trained model equals bigramPerplexity") {
    // train == score corpus: the frozen-model path must reproduce the
    // fast path exactly and never touch the unseen fallbacks
    val d = docs("a b a", "b b", "c a b c")
    val model = TextAnalysis.bigramModelFrom(d)
    val scored = TextAnalysis.bigramScore(d, model).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val fast = TextAnalysis.bigramPerplexityFrom(d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(scored.map(t => (t._1, t._2, t._4, t._5)).toSeq == fast.toSeq)
    assert(scored.forall(_._3 == 0L), "self-scoring hit an unseen fallback")
  }

  test("bigramScore: unseen bigrams charge the add-1 fallback mass") {
    // model trained on "a b"; scoring "a c x y" hits every fallback:
    // pairs (<s>,a)(a,c)(c,x)(x,y).
    // train pairs: (<s>,a)(a,b); V=2; cu: <s>=1, a=1
    //   (<s>,a): seen  nll = -ln(2/3)          = 0.405465
    //   (a,c):   ctx   nll = ln(1+2) = ln 3    = 1.098612
    //   (c,x):   und   nll = ln 2              = 0.693147
    //   (x,y):   und   nll = 0.693147
    val model = TextAnalysis.bigramModelFrom(docs("a b"))
    val got = TextAnalysis.bigramScore(docs("a c x y"), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val avg = BigDecimal((0.405465 + 1.098612 + 0.693147 + 0.693147) / 4)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((0L, 4L, 3L, avg)))
  }

  test("pplHoldout: held-out docs only, OOV mass measured") {
    val df = TextAnalysis.pplHoldout(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length < 500, "holdout must be a strict subset")
    // the 20% split by PolyHash(doc_id) — every scored doc is in it
    rows.foreach { r =>
      assert(r.getAs[Long]("n_unseen") >= 0 &&
        r.getAs[Long]("n_unseen") <= r.getAs[Long]("n_scored"))
      assert(r.getAs[Double]("ppl") > 1.0)
    }
  }

  test("dsirSelect: the importance ratio recovers the target domain") {
    val rows = TextAnalysis.dsirSelect(spark, sfDir, k = 20).collect()
    assert(rows.length == 20)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to 20L))
    // log ratios descend with rank (the selection really is top-k)
    val lr = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("log_ratio"))
    assert(lr.zip(lr.tail).forall { case (a, b) => a >= b })
    // the target-LM/raw-LM ratio should over-select the target slice
    // relative to its corpus share
    val docs = graft.Tables.documents(spark, sfDir)
    val enCorpusShare = docs.filter(org.apache.spark.sql.functions.col("lang") === "en")
      .count().toDouble / docs.count()
    val enSelShare = rows.count(_.getAs[String]("lang") == "en").toDouble / 20
    assert(enSelShare > enCorpusShare,
      s"selection share $enSelShare must beat corpus share $enCorpusShare")
  }

  test("charEntropy: closed-form values for uniform, skewed and degenerate docs") {
    val got = TextAnalysis.charEntropyFrom(docs("ab", "aab", "aaaa"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // "ab": uniform over 2 symbols → exactly 1 bit
    // "aab": (ln 3 − (2 ln 2)/3)/ln 2 = 0.918296 (6dp)
    // "aaaa": single symbol → 0 bits
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 1.0),
      (1L, 3L, 2L, 0.918296),
      (2L, 4L, 1L, 0.0)))
  }

  test("cmsError: the one-sided contract holds and ranks cover the exact top-k") {
    val rows = TextAnalysis.cmsError(spark, sfDir, k = 10).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Long]("rk")).toSeq == (1L to 10L))
    rows.foreach { r =>
      assert(r.getAs[Boolean]("guarantee_ok"),
        s"CMS under-estimated ${r.getAs[String]("tok")}")
      assert(r.getAs[Long]("overestimate") >= 0)
      assert(r.getAs[Double]("over_share") >= 0.0)
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"))
    }
    // exact counts descend with rank (the audit targets really are the
    // heavy hitters, same tie-break as x_heavy_hitters)
    val ex = rows.sortBy(_.getAs[Long]("rk")).map(_.getAs[Long]("exact"))
    assert(ex.zip(ex.tail).forall { case (a, b) => a >= b })
  }

  test("burstiness: uniform token reads VMR 0, one-doc burst reads the closed form") {
    import spark.implicits._
    // "a" once in each of 5 docs (VMR 0); "b" 10 times in one doc:
    // VMR = (5*100 - 100)/((5-1)*10) = 10
    val d = Seq(
      (1L, "a " + Seq.fill(10)("b").mkString(" "), "en", "web", 20L),
      (2L, "a x", "en", "web", 3L), (3L, "a y", "en", "web", 3L),
      (4L, "a z", "en", "web", 3L), (5L, "a w", "en", "web", 3L))
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    d.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextAnalysis.burstiness(spark, dir).collect()
      .map(r => r.getAs[String]("tok") -> r).toMap
    assert(rows("a").getAs[Long]("n_docs_with") === 5L)
    assert(rows("a").getAs[Double]("vmr") === 0.0)
    assert(rows("b").getAs[Long]("n_docs_with") === 1L)
    assert(rows("b").getAs[Long]("occurrences") === 10L)
    assert(rows("b").getAs[Double]("vmr") === 10.0)
  }

  test("heapsLaw: crafted corpus yields exact per-bucket growth; corpus invariants hold") {
    import spark.implicits._
    // 10 docs, doc_id order = bucket order at buckets=10 (one per
    // bucket): doc i introduces token t<i> and repeats the shared
    // token "s" i times — cum_types = i+1 growth (s arrives once),
    // cum_tokens = i new + triangular repeats
    val d = (1L to 10L).map(i =>
      (i, (s"t$i" +: Seq.fill(i.toInt)("s")).mkString(" "), "en", "web", 10L))
    val dir = java.nio.file.Files.createTempDirectory("heaps")
    try {
      d.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val rows = graft.operators.TextAnalysis.heapsLaw(spark, dir.toString).collect()
      assert(rows.length === 10)
      rows.zipWithIndex.foreach { case (r, idx) =>
        val i = idx + 1
        assert(r.getAs[Long]("bkt") === i.toLong)
        // tokens so far: sum_{j<=i} (1 + j); types so far: i distinct
        // t<j> plus the shared "s"
        assert(r.getAs[Long]("cum_tokens") === (i + i * (i + 1) / 2).toLong)
        assert(r.getAs[Long]("cum_types") === (i + 1).toLong)
      }
    } finally {
      // the box's /tmp headroom is a documented constraint — don't
      // leak a parquet dir per run (ADVICE r14)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
    // corpus invariants at sf: monotone growth, types never exceed
    // tokens (ratio shape is data-dependent, so only the bounds are
    // asserted, not Heaps-curve concavity)
    val c = graft.operators.TextAnalysis.heapsLaw(spark, sfDir).collect()
    assert(c.nonEmpty && c.length <= 10)
    c.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("cum_tokens") > a.getAs[Long]("cum_tokens"))
        assert(b.getAs[Long]("cum_types") >= a.getAs[Long]("cum_types"))
      case _ => ()
    }
    c.foreach(r => assert(r.getAs[Long]("cum_types") <= r.getAs[Long]("cum_tokens")))
  }

  test("readability: hand-computed Flesch on crafted docs; terminator-less doc is one sentence") {
    // "the cat sat. the dog ran!": 6 words, 2 sentences, 6 vowel runs
    // flesch = 206.835 - 1.015*(6/2) - 84.6*(6/6) = 119.19
    // fk     = 0.39*3 + 11.8*1 - 15.59            = -2.62
    val d = Seq(
      (1L, "the cat sat. the dog ran!", "en", "web", 25L),
      // no terminator -> min-1 sentence; "xyz zz" has no vowels (y IS
      // a vowel here, so use words without aeiouy): "tsk tsk" -> 2
      // vowel-less words charge 1 syllable each
      (2L, "tsk tsk", "en", "chat", 7L))
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("read").toString
    d.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.readability(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r)).toMap
    val web = rows("web")
    assert(web.getAs[Long]("n_words") === 6L)
    assert(web.getAs[Long]("n_sentences") === 2L)
    assert(web.getAs[Long]("n_syllables") === 6L)
    assert(web.getAs[Double]("flesch") === 119.19)
    assert(web.getAs[Double]("fk_grade") === -2.62)
    val chat = rows("chat")
    assert(chat.getAs[Long]("n_words") === 2L)
    assert(chat.getAs[Long]("n_sentences") === 1L)
    assert(chat.getAs[Long]("n_syllables") === 2L)
  }

  test("gopher rules: each rule flips on the crafted violating document") {
    import spark.implicits._
    // good: 50 words, stopwords >= 2, mean word length in [3,10], max <= 15
    val goodDoc = (("the fox and dog ran fast " * 9).trim + " to den gone now")
    val shortDoc = "the a"                                   // violates word count
    val longWordDoc = ("the a " + Seq.fill(60)("supercalifragilistic").mkString(" "))
    val noStopDoc = Seq.fill(60)("fox").mkString(" ")        // no stopwords
    val thinDoc = ("the a " + Seq.fill(60)("xy").mkString(" ")) // mean len < 3
    val df = Seq(goodDoc, shortDoc, longWordDoc, noStopDoc, thinDoc).zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", s"src$i", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("gopher").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextAnalysis.gopherRules(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out("src0").getAs[Long]("n_pass") == 1L, out("src0").toString)
    assert(out("src1").getAs[Long]("n_wordcount_ok") == 0L)
    assert(out("src2").getAs[Long]("n_maxlen_ok") == 0L)
    assert(out("src3").getAs[Long]("n_stopword_ok") == 0L)
    assert(out("src4").getAs[Long]("n_meanlen_ok") == 0L)
  }
}
