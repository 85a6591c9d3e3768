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
