package graft

import org.apache.spark.sql.functions._

/** The scale-probe amplifier's three contracts: join cardinalities
  * scale exactly linearly, lexical content never collides across
  * copies, and the embedding perturbation is an exact within-copy
  * isometry. A violation of any of these would make the measured
  * scaling exponents meaningless (the probe would be timing a
  * different workload shape, not a bigger corpus).
  */
class AmplifySpec extends SparkSuite {
  private lazy val dst = {
    val d = java.nio.file.Files.createTempDirectory("amp").toString
    Amplify.amplifyAll(spark, sfDir, d, 3)
    d
  }

  test("row counts and join fan-out scale exactly linearly") {
    val baseOrders = Tables.orders(spark, sfDir).count()
    val ampOrders = Tables.orders(spark, dst).count()
    assert(ampOrders == 3 * baseOrders)

    def joined(dir: String): Long =
      Tables.orders(spark, dir).join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(joined(dst) == 3 * joined(sfDir),
      "per-copy key offsets must preserve the orders->lineitem fan-out exactly")

    // shared dims are NOT replicated
    assert(Tables.nation(spark, dst).count() ==
           Tables.nation(spark, sfDir).count())
  }

  test("documents: within-copy duplicate structure isomorphic, zero cross-copy collisions") {
    val base = Tables.documents(spark, sfDir)
    val amp = Tables.documents(spark, dst)
    // every text belongs to exactly one copy (no cross-copy collisions):
    // total distinct = 3x base distinct
    val dBase = base.select("text").distinct().count()
    assert(amp.select("text").distinct().count() == 3 * dBase)
    // the exact-dup group-size histogram is identical per copy
    val hBase = base.groupBy("text").count()
      .groupBy("count").agg(count(lit(1)).as("n_groups"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val hAmp = amp.groupBy("text").count()
      .groupBy("count").agg(count(lit(1)).as("n_groups"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hAmp == hBase.map { case (sz, ng) => (sz, ng * 3) },
      "each copy must reproduce the base duplicate-group histogram")
    // n_chars stays consistent with the perturbed text
    assert(amp.filter(length(col("text")) =!= col("n_chars")).count() == 0)
  }

  test("customer names: digit cipher keeps within-copy block structure, separates copies") {
    val amp = Tables.customer(spark, dst)
    val base = Tables.customer(spark, sfDir)
    // copy 0 is the identity cipher
    assert(amp.filter(col("c_custkey") < Amplify.KeyOffset)
      .select("c_name").collect().map(_.getString(0)).toSet ==
      base.select("c_name").collect().map(_.getString(0)).toSet)
    // the fuzzy-dedup block key: per-copy histograms must equal the
    // base histogram (workload isomorphism), and block keys must be
    // DISJOINT across copies (else pair counts grow quadratically)
    def blocks(df: org.apache.spark.sql.DataFrame, lo: Long, hi: Long) =
      df.filter(col("c_custkey") >= lo && col("c_custkey") < hi)
        .groupBy(substring(col("c_name"), 10, 7).as("blk"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
    val b0 = blocks(amp, 0L, Amplify.KeyOffset)
    val b1 = blocks(amp, Amplify.KeyOffset, 2 * Amplify.KeyOffset)
    assert(b0.map(_._2).sorted.toSeq == b1.map(_._2).sorted.toSeq,
      "per-copy block-size histograms must be identical")
    assert(b0.map(_._1).toSet.intersect(b1.map(_._1).toSet).isEmpty,
      "block keys must never merge across copies")
  }

  test("customer cipher keyspace extends past 36 copies (supercopy odd-position term)") {
    // Pre-extension, copy c and c+36 shared the digit map (7c mod 36),
    // re-merging blocks at N > 36 and reintroducing the quadratic
    // pair-count artifact. The odd-position 11·(copy div 36) term must
    // keep the maps distinct across supercopies while preserving the
    // within-copy block histogram.
    val amp = Amplify.amplifyCustomer(spark, Tables.customer(spark, sfDir), 73)
    def blocks(c: Long): Seq[String] =
      amp.filter(col("c_custkey") >= c * Amplify.KeyOffset &&
                 col("c_custkey") < c * Amplify.KeyOffset + Amplify.KeyOffset)
        .select(substring(col("c_name"), 10, 7))
        .collect().map(_.getString(0)).toSeq
    val b0 = blocks(0); val b36 = blocks(36); val b72 = blocks(72)
    assert(b0.toSet.intersect(b36.toSet).isEmpty,
      "copy 36 must not reuse copy 0's digit map")
    assert(b36.toSet.intersect(b72.toSet).isEmpty)
    assert(b0.toSet.intersect(b72.toSet).isEmpty)
    assert(b36.groupBy(identity).map(_._2.size).toSeq.sorted ==
           b0.groupBy(identity).map(_._2.size).toSeq.sorted,
      "block-size histogram must be isomorphic in the extended range")
    intercept[IllegalArgumentException] {
      Amplify.amplifyCustomer(spark, Tables.customer(spark, sfDir), 1297)
    }
  }

  test("embeddings: sign perturbation is an exact within-copy isometry") {
    val dot = (a: String, b: String) =>
      expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    val e = Tables.embeddings(spark, dst)
    def pair(c: Long) = e.filter(col("vec_id") === c * Amplify.KeyOffset)
      .select(col("embedding").as("ea"))
      .crossJoin(e.filter(col("vec_id") === c * Amplify.KeyOffset + 1)
        .select(col("embedding").as("eb")))
      .select(dot("ea", "eb").as("d"),
        sqrt(dot("ea", "ea")).as("na"), sqrt(dot("eb", "eb")).as("nb"))
      .collect().head
    val b = pair(0) // copy 0 == base
    val p = pair(1)
    // bit-exact: (s.a).(s.b) multiplies each elementwise product by s^2 = 1
    assert(p.getDouble(0) == b.getDouble(0), "dot products must be bit-identical")
    assert(p.getDouble(1) == b.getDouble(1) && p.getDouble(2) == b.getDouble(2),
      "norms must be bit-identical")

    // cross-copy cosine decorrelates: same base vector, two copies
    val x = e.filter(col("vec_id") === 5L)
      .select(col("embedding").as("ea"))
      .crossJoin(e.filter(col("vec_id") === Amplify.KeyOffset + 5L)
        .select(col("embedding").as("eb")))
      .select((dot("ea", "eb") / (sqrt(dot("ea", "ea")) * sqrt(dot("eb", "eb")))).as("cos"))
      .collect().head.getDouble(0)
    assert(math.abs(x) < 0.5, s"cross-copy cosine should decorrelate, got $x")
  }
}
