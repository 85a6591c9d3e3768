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
}
