package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Stats}

class MmrKendallSpec extends SparkSuite {
  import spark.implicits._

  test("mmrRerank matches an exact greedy MMR simulated in plain Scala") {
    val out = Similarity.mmrRerank(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))

    // local oracle: quantize, shortlist, greedy — same integer arithmetic
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        // BigDecimal HALF_UP, not math.round (half-toward-+inf): Spark's
        // round() is HALF_UP away-from-zero, and the two differ on exact
        // negative half-units (the PipelineOpsSpec microVecs discipline)
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toArray)
      .toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (0L until 10L).flatMap { qid =>
      val qv = vecs(qid)
      val sl = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, d2(qv, v)) }
        .sortBy { case (id, d) => (d, id) }.take(20)
      var selected = Vector.empty[(Long, Long, Long)] // (cand, rk, score)
      for (r <- 1 to 5) {
        val remaining = sl.filterNot(c => selected.exists(_._1 == c._1))
        val scored = remaining.map { case (id, dq) =>
          val score = if (r == 1) 7L * dq
            else 7L * dq - 3L * selected.map(s => d2(vecs(id), vecs(s._1))).min
          (id, score)
        }
        val (pick, score) = scored.minBy { case (id, s) => (s, id) }
        selected :+= ((pick, r.toLong, score))
      }
      selected.map { case (cand, rk, score) => (qid, rk, cand, score) }
    }.toSet
    assert(out.toSet == expected,
      s"greedy divergence: ${(out.toSet -- expected).take(3)} vs ${(expected -- out.toSet).take(3)}")
  }

  test("mmrRerank rank-1 is the plain nearest neighbor and picks are distinct per query") {
    val out = Similarity.mmrRerank(spark, sfDir)
    val perQuery = out.groupBy("query_id")
      .agg(countDistinct("cand_id").as("d"), count(lit(1)).as("n"))
    assert(perQuery.filter(col("d") =!= col("n")).isEmpty)
    // rank 1 has no diversity term: mmr_scaled == 7*d2q
    assert(out.filter(col("rk") === 1 &&
      col("mmr_scaled") =!= col("d2q") * 7).isEmpty)
  }

  test("kendallFromDaily: perfect concordance, perfect discordance, tie correction") {
    val daily = Seq(
      // s_up: v rises with m -> tau_b = 1
      ("s_up", 1, 100L, 10L), ("s_up", 2, 200L, 20L), ("s_up", 3, 300L, 30L),
      // s_dn: v falls as m rises -> tau_b = -1
      ("s_dn", 1, 100L, 30L), ("s_dn", 2, 200L, 20L), ("s_dn", 3, 300L, 10L),
      // s_tie: m = (1,1,2), v = (1,2,2): S = 1 (one concordant pair,
      // two tied pairs), n0 = 3, n1 = n2 = 1 -> tau_b = 1/sqrt(4) = 0.5
      ("s_tie", 1, 100L, 1L), ("s_tie", 2, 100L, 2L), ("s_tie", 3, 200L, 2L),
      // s_flat: every m tied -> denominator 0 -> dropped
      ("s_flat", 1, 100L, 1L), ("s_flat", 2, 100L, 2L))
      .toDF("symbol", "dd", "m", "v")
      .withColumn("day", to_date(concat(lit("2024-01-0"), col("dd"))))
      .select("symbol", "day", "m", "v")
    val got = Stats.kendallFromDaily(daily).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set("s_up", "s_dn", "s_tie"))
    assert(got("s_up") == ((3L, 3L, 1.0)))
    assert(got("s_dn") == ((3L, -3L, -1.0)))
    assert(got("s_tie") == ((3L, 1L, 0.5)))
  }

  test("kendallTau on the corpus: bounded in [-1, 1], nonempty") {
    val rows = Stats.kendallTau(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0))
  }

  test("RBO contributions: identical rankings score exactly 1, weights decay") {
    // sum over m of C(m) telescopes to 60 * sum(w_d) — an identical
    // ranking pair (every shared neighbor at m = its own rank) divides
    // to exactly 1.0
    val den = 60L * Similarity.rboWeightsU(5).sum
    assert(Similarity.rboContribU(5).map(_._2).sum == den)
    // top-weightedness: losing agreement at rank 1 costs more than at 5
    val c = Similarity.rboContribU(5).toMap
    assert(c(1) > c(5) && Similarity.rboWeightsU(5) == Similarity.rboWeightsU(5).sorted.reverse)
  }

  test("knnIvfRbo on the corpus: bounded in [0, 1], one row per query") {
    val rows = Similarity.knnIvfRbo(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("rrfWeightsU: frozen round(1e12/(60+r)) micro-units, decreasing, capped at 64") {
    assert(Similarity.rrfWeightsU(5) === Seq(
      16393442623L, 16129032258L, 15873015873L, 15625000000L, 15384615385L))
    assert(Similarity.rrfWeightsUAll.size === 64)
    assert(Similarity.rrfWeightsUAll.sliding(2).forall {
      case Seq(a, b) => a > b
      case _         => true
    })
    intercept[IllegalArgumentException](Similarity.rrfWeightsU(65))
  }

  test("rrfFusion on the corpus: the fused list beats every single retriever") {
    val rows = Similarity.rrfFusion(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("retriever")).sorted ===
      Array("ivf_a", "ivf_b", "ivf_c", "rrf_fused"))
    val hits = rows.map(r =>
      r.getAs[String]("retriever") -> r.getAs[Long]("n_hits")).toMap
    // the headline the operator exists for: fusing three decorrelated
    // equal-cost candidate generators strictly beats each one
    assert(hits.filter(_._1 != "rrf_fused").values.forall(_ < hits("rrf_fused")),
      hits.toString)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_truth") === 50L) // k=5 x 10 queries
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      // recall is exactly n_hits / n_truth rounded to 6
      assert(rec === BigDecimal(r.getAs[Long]("n_hits").toDouble / 50.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }
}
