package graft

import graft.operators.Similarity

/** SemDeDup granularity contract: k is DERIVED (round(sqrt(n))), and
  * the per-cell quadratic pair join stays bounded even when the
  * embedding space is heavily skewed — the claim the operator's scale
  * story rests on, pinned here on a fixture the corpus never produces.
  */
class SemanticDedupSpec extends SparkSuite {
  import spark.implicits._

  test("coarseK follows the sqrt-n rule") {
    assert(Similarity.coarseK(1) == 1)
    assert(Similarity.coarseK(500) == 22)   // sqrt = 22.36
    assert(Similarity.coarseK(2000) == 45)  // sqrt = 44.72
    assert(Similarity.coarseK(1000000) == 1000)
  }

  test("semanticK derives cluster count from the corpus, not a constant") {
    val n = graft.Tables.embeddings(spark, sfDir).count()
    assert(Similarity.semanticK(spark, sfDir) == Similarity.coarseK(n))
  }

  test("skewed fixture: cells stay narrow enough that the pair join is never corpus-quadratic") {
    // 400 vectors, 8 dims: 80% piled into one tight blob (the skew an
    // uncurated crawl produces — mass duplication around one template)
    // plus a 20% spread tail. With k = sqrt(400) = 20 DERIVED cells,
    // Lloyd from the deterministic first-k seed must still split the
    // blob across multiple cells: the quadratic term is sum of
    // width^2, so the bound that matters is the LARGEST cell.
    val vecs = (0L until 400L).map { i =>
      val base = if (i % 5 != 0) 0.5f else (i % 97).toFloat / 97f
      (i, Array.tabulate(8)(d =>
        base + (i % 13).toFloat / 1300f + d * 0.001f))
    }.toDF("vec_id", "embedding")
    val yieldTable = Similarity.semanticDedupFrom(vecs, maxD2 = 1000000000L)
      .collect()
    val widths = yieldTable.map(r => r.getLong(1)) // n_members per cell
    assert(widths.sum == 400, s"every vector routed exactly once: ${widths.sum}")
    assert(widths.length > 1, "skew must not collapse training to one cell")
    // the scale claim: max cell width stays a small multiple of n/k
    // (= 20 here), never a constant fraction of n
    assert(widths.max <= 8 * 20,
      s"largest cell ${widths.max} of 400 — pair join going quadratic")
    // yield accounting invariants hold per cell
    yieldTable.foreach { r =>
      assert(r.getLong(1) == r.getLong(3) + r.getLong(4),
        s"n_members != n_dropped + n_kept in $r")
    }
  }
}
