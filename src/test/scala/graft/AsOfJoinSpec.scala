package graft

import graft.operators.AsOfJoin

/** As-of join semantics, incl. the null-payload regression: all payload
  * fields must come from the SAME (latest) right row — a per-column
  * `last(ignoreNulls)` would skip a legitimately-null field and tear
  * the row.
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("attaches the latest right row at or before each left row, per key") {
    val left = Seq(("k1", 5L, "c1"), ("k1", 10L, "c2"), ("k2", 4L, "c3"))
      .toDF("key", "ord", "tag")
    val right = Seq(
      ("k1", 3L, Option(1.0), Option(100L)),
      ("k1", 7L, Option(2.0), Option(101L)),
      ("k2", 9L, Option(9.0), Option(102L))  // after k2's left row -> no match
    ).toDF("key", "ord", "v", "rid")
    val out = AsOfJoin.asOf(left, right, "key", "ord", Seq("v", "rid"))
      .orderBy("ord", "key")
      .select("key", "ord", "tag", "asof_v", "asof_rid").collect()
    assert(out.length == 3)
    val k2 = out.find(_.getString(0) == "k2").get
    assert(k2.isNullAt(3) && k2.isNullAt(4), "no preceding right row -> null payload")
    val c1 = out.find(_.getString(2) == "c1").get
    assert(c1.getDouble(3) == 1.0 && c1.getLong(4) == 100L)
    val c2 = out.find(_.getString(2) == "c2").get
    assert(c2.getDouble(3) == 2.0 && c2.getLong(4) == 101L)
  }

  test("equal ord is inclusive: a right row at the same ord is visible") {
    val left  = Seq(("k", 5L, "c")).toDF("key", "ord", "tag")
    val right = Seq(("k", 5L, Option(7.0), Option(1L))).toDF("key", "ord", "v", "rid")
    val out = AsOfJoin.asOf(left, right, "key", "ord", Seq("v", "rid")).collect()
    assert(out.head.getAs[Double]("asof_v") == 7.0)
  }

  test("forward variant attaches the earliest right row at or after each left row") {
    val left = Seq(("k1", 5L, "c1"), ("k1", 1L, "c2"), ("k2", 9L, "c3"))
      .toDF("key", "ord", "tag")
    val right = Seq(
      ("k1", 3L, Option(1.0), Option(100L)),
      ("k1", 5L, Option(2.0), Option(101L)),  // same ord as c1 -> inclusive match
      ("k2", 4L, Option(9.0), Option(102L))   // before k2's left row -> no match
    ).toDF("key", "ord", "v", "rid")
    val out = AsOfJoin.asOfForward(left, right, "key", "ord", Seq("v", "rid"))
      .select("tag", "asof_v", "asof_rid").collect()
      .map(r => r.getString(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(out("c1") == (Some(2.0), Some(101L)), "inclusive: ord=5 right row matches")
    assert(out("c2") == (Some(1.0), Some(100L)), "earliest following row, not latest")
    assert(out("c3") == (None, None), "no following right row -> null payload")
  }

  test("null payload value in the LATEST right row is kept, not skipped (torn-row regression)") {
    val left = Seq(("k", 10L, "c")).toDF("key", "ord", "tag")
    val right = Seq(
      ("k", 1L, Option(7.0), Option(100L)),
      ("k", 2L, Option.empty[Double], Option(101L))  // latest row: v is NULL
    ).toDF("key", "ord", "v", "rid")
    val out = AsOfJoin.asOf(left, right, "key", "ord", Seq("v", "rid"))
      .select("asof_v", "asof_rid").collect().head
    // both fields must come from the ord=2 row: (null, 101) — NOT (7.0, 101)
    assert(out.isNullAt(0), s"asof_v must be null (latest row), got ${out.get(0)}")
    assert(out.getLong(1) == 101L)
  }
}
