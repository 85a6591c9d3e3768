package graft

import graft.operators.TextAnalysis

/** BPE trainer unit coverage on crafted corpora — the oracle checks
  * determinism against DuckDB on the real corpus; these pin the
  * algorithmic edge cases a synthetic corpus may never hit.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def merges(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, Long)] =
    df.select("round", "sym_a", "sym_b", "pair_count").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def bpeCounts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("overlapping matches merge greedily left-to-right (odd run)") {
    // "aaa" = [a,a,a,</w>]: (a,a) has count 2 and wins; greedy merges
    // position 1 only (position 2's left 'a' was consumed) → [aa,a,</w>]
    val d = docs("aaa")
    assert(merges(TextAnalysis.bpeTrainFrom(d, rounds = 1)) ==
      Seq((1L, "a", "a", 2L)))
    assert(bpeCounts(TextAnalysis.bpeTokenCountsFrom(d, rounds = 1)) ==
      Map(0L -> 3L))
  }

  test("overlapping matches merge greedily left-to-right (even run)") {
    // "aaaa" = [a,a,a,a,</w>]: matches at 1,2,3 → greedy takes 1 and 3
    // → [aa,aa,</w>] = 3 symbols
    val d = docs("aaaa")
    assert(merges(TextAnalysis.bpeTrainFrom(d, rounds = 1)) ==
      Seq((1L, "a", "a", 3L)))
    assert(bpeCounts(TextAnalysis.bpeTokenCountsFrom(d, rounds = 1)) ==
      Map(0L -> 3L))
  }

  test("count ties break to the lexically smallest pair") {
    // words ab, cd each twice: (a,b), (b,</w>), (c,d), (d,</w>) all
    // count 2 — (a,b) is the lexical minimum
    val m = merges(TextAnalysis.bpeTrainFrom(docs("ab cd ab cd"), rounds = 1))
    assert(m == Seq((1L, "a", "b", 2L)))
  }

  test("merged symbols participate in later rounds") {
    // "abab": round 1 merges (a,b) → [ab,ab,</w>]; round 2 pairs are
    // (ab,ab) and (ab,</w>) at count 1 — '<' sorts before 'a', so
    // (ab,</w>) wins the tie
    val m = merges(TextAnalysis.bpeTrainFrom(docs("abab"), rounds = 2))
    assert(m == Seq((1L, "a", "b", 2L), (2L, "ab", "</w>", 1L)))
  }

  test("pair counts weight by word frequency, and exhaustion stops early") {
    // "xy" three times, "zw" once: (x,y) count 3 wins round 1. By
    // round 4 every word is a single symbol — no pairs remain, so a
    // 10-round request returns only the realizable merges.
    val m = merges(TextAnalysis.bpeTrainFrom(docs("xy xy xy zw"), rounds = 10))
    assert(m.head == ((1L, "x", "y", 3L)), s"got $m")
    assert(m.size < 10, s"expected early exhaustion, got ${m.size} rounds")
    // fully merged corpus: each word is exactly one token
    val c = bpeCounts(TextAnalysis.bpeTokenCountsFrom(docs("xy xy xy zw"), rounds = 10))
    assert(c == Map(0L -> 4L))
  }

  test("trainer leaves no persisted blocks behind after release") {
    Caches.releaseAll(spark)
    TextAnalysis.bpeTrainFrom(docs("abc abd abc"), rounds = 3).collect()
    // bpeTrain releases the state checkpoint itself (merges are
    // driver-side); nothing should survive the query
    assert(Caches.isEmpty(spark))
  }
}
