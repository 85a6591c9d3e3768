package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** PPJoin prefix-filtered exact Jaccard join: equality with the
  * unpruned inverted-index join (the no-false-negatives theorem,
  * exercised on the real corpus), measured pruning, and plan shape.
  */
class PrefixJoinSpec extends SparkSuite {

  test("prefix-filtered result equals the brute inverted-index join") {
    val pruned = Dedup.prefixJaccardJoin(spark, sfDir)
      .select("da", "db", "n_common").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sh = Dedup.wordGramRows(spark, sfDir).select("doc_id", "gh")
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val brute = sh.as("a").join(sh.as("b"),
        col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"))
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .filter(col("c") * 9 >= (col("na") + col("nb")) * 4)
      .select("da", "db", "c").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned === brute)
    assert(brute.nonEmpty, "fixture should contain near-dup pairs at jaccard >= 0.8")
  }

  test("prefix filtering actually prunes the candidate space") {
    val sh = Dedup.wordGramRows(spark, sfDir).select("doc_id", "gh").cache()
    try {
      val allPairs = sh.as("a").join(sh.as("b"),
          col("a.gh") === col("b.gh") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
      val results = Dedup.prefixJaccardJoin(spark, sfDir).count()
      // at t = 0.8 the verified pair set must be far below the co-gram
      // pair space the unpruned join would verify
      assert(results * 20 < allPairs,
        s"pruning ineffective: $results results vs $allPairs co-gram pairs")
    } finally sh.unpersist()
  }

  test("prefix join plan: equi-joins only, no cartesian products") {
    val plan = Dedup.prefixJaccardJoin(spark, sfDir)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoop"), plan)
  }
}
