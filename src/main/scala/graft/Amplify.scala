package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus amplifier for the empirical scale probe:
  * replicates an sf directory N times with re-keyed ids, so the
  * scaling exponent of every headline query can be MEASURED (t ~
  * C·N^alpha) instead of argued from plan shape.
  *
  * `runMain graft.Amplify <srcDir> <dstDir> <N>`
  *
  * Design constraints (all three are load-bearing for a fair probe):
  *
  *  1. JOIN CARDINALITIES PRESERVED. Every int64 key domain is offset
  *     by `copy * 10^10` (all base keys are far below 10^10), so each
  *     copy is a disjoint island: orders still join their own
  *     lineitems, customers their own orders, documents their own
  *     embeddings-by-id. Fact/dim fan-outs per copy are identical to
  *     the base corpus; the tiny shared dims (region, nation) are NOT
  *     replicated, exactly like a real corpus growing under a fixed
  *     reference taxonomy.
  *
  *  2. SIMILARITY WORKLOAD LINEAR IN N. Verbatim replication would
  *     make every near-dup/similarity query quadratic BY CONSTRUCTION
  *     (N identical texts are mutual near-dups: N(N-1)/2 pairs per
  *     group), and no engine can be linear on a quadratically growing
  *     OUTPUT — the probe would measure the workload, not the engine.
  *     So copy c > 0 perturbs content deterministically:
  *       - documents: every whitespace token gets a per-copy suffix
  *         (`the` -> `the_c3`), which changes every shingle/gram →
  *         cross-copy Jaccard = 0, while WITHIN a copy the shingle
  *         multiset structure (and hence the pair graph) is isomorphic
  *         to the base corpus. `n_chars` is recomputed to match.
  *       - embeddings: elementwise multiplication by a per-copy ±1
  *         sign pattern (hash(copy, dim) parity). A fixed sign flip is
  *         an exact ISOMETRY within the copy — (s⊙a)·(s⊙b) = a·b and
  *         norms are unchanged, so every within-copy cosine, cluster,
  *         and PQ cell is bit-identical in structure to the base —
  *         while cross-copy cosines decorrelate to ~0.
  *
  *  3. DETERMINISTIC. Offsets are arithmetic; perturbations key off
  *     (copy, position) through xxhash64 — same input dir + N always
  *     produces the same output corpus (as a row set).
  *
  * Copy 0 is the unmodified base corpus, so amplified(N=1) == base.
  *
  * Scale shape of the amplifier itself: the tiny base is round-robin
  * spread across all cores (the only shuffle, ~base bytes), then one
  * broadcast-range fan-out per table writes scan × N rows straight to
  * parquet — amplification cost is linear in output size and
  * parallel in the core count, never bottlenecked on the base file's
  * single split.
  */
object Amplify {
  val KeyOffset = 10000000000L

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Amplify <srcDir> <dstDir> <N>")
    val (src, dst, n) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    amplifyAll(spark, src, dst, n)
    spark.stop()
  }

  def amplifyAll(spark: SparkSession, src: String, dst: String, n: Int): Unit = {
    // The fan-out and per-row transforms are written directly from the
    // crossJoin stage: withCopies pre-spreads the (tiny) base across
    // all cores, so writing without a post-hoc repartition avoids
    // shuffling the FULL amplified corpus (base x N bytes) just to fix
    // parallelism that the cheap base-side spread already provides.
    // Measured on this box: N=300 amplify 23 min -> ~2 min (the old
    // shape ran every transform in the single-split scan stage).
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // tiny shared dims: copied once, unmodified
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(amplifyCustomer(spark, Tables.customer(spark, src), n), "customer")
    write(amplifyKeyed(spark, Tables.supplier(spark, src), n, Seq("s_suppkey")), "supplier")
    write(amplifyKeyed(spark, Tables.part(spark, src), n, Seq("p_partkey")), "part")
    write(amplifyKeyed(spark, Tables.orders(spark, src), n,
      Seq("o_orderkey", "o_custkey")), "orders")
    write(amplifyKeyed(spark, Tables.lineitem(spark, src), n,
      Seq("l_orderkey", "l_partkey", "l_suppkey")), "lineitem")
    write(amplifyKeyed(spark, Tables.events(spark, src), n,
      Seq("event_id", "user_id")), "events")
    write(amplifyDocuments(spark, Tables.documents(spark, src), n), "documents")
    write(amplifyEmbeddings(spark, Tables.embeddings(spark, src), n), "embeddings")
  }

  /** Cross the base rows with copies 0..n-1 (broadcast nested loop
    * over an n-row range — no shuffle on the amplified side) and
    * offset the named int64 keys by copy * 10^10.
    *
    * The base is round-robin-spread across the full core count FIRST:
    * every sf0.1 table fits in one parquet split, so without the
    * spread the N-fold fan-out AND the per-token/per-dim transforms
    * all run in a single scan task while 31 cores idle. Shuffling the
    * base costs ~base bytes (KBs–MBs); it parallelizes base x N bytes
    * of downstream work. The explicit partition count is deliberate —
    * AQE does not coalesce an explicit repartition(n).
    */
  private[graft] def withCopies(spark: SparkSession, base: DataFrame, n: Int): DataFrame =
    base.repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(broadcast(spark.range(n).toDF("amp_copy")))

  private[graft] def amplifyKeyed(spark: SparkSession, base: DataFrame, n: Int,
                                  keys: Seq[String]): DataFrame = {
    val out = keys.foldLeft(withCopies(spark, base, n)) { (df, k) =>
      df.withColumn(k, col(k) + col("amp_copy") * lit(KeyOffset))
    }
    out.drop("amp_copy")
  }

  /** Customer rows re-key c_custkey AND cipher the digits of c_name —
    * the name is derived content (`Customer#%09d`), and replicating it
    * verbatim merges the fuzzy-name blocking of every copy into one
    * block (block sizes × N → pair counts × N², measured as a 2.0
    * scaling exponent on x_fuzzy_dedup before this fix — the probe
    * timing an amplifier artifact, not the engine). The cipher maps
    * digit d to alphabet[(d + 7·copy) mod 36] over [0-9a-z]:
    * position-independent bijection, so within a copy every substring
    * equality (and hence the block histogram and Hamming structure)
    * is EXACTLY the base corpus's; across copies the image of every
    * digit differs for any copy pair with distinct (7·copy mod 36) —
    * all pairs at N ≤ 36 — so blocks never merge. Copy 0 is the
    * identity map, preserving amplified(1) == base.
    *
    * Keyspace extension past 36 copies (the 7·copy term alone repeats
    * at copy+36, which would re-merge blocks and reintroduce the N²
    * pair artifact): odd character positions additionally shift by
    * 11·(copy div 36). Per POSITION the map is still a digit
    * bijection, so within a copy block-key equality (fixed-format
    * names put digits at fixed positions) and equal-length
    * substitution distance — which for the 9-digit tail IS
    * levenshtein ≤ 1, since equal-length strings at edit distance 1
    * admit only a substitution — are exactly the base corpus's.
    * Across copies c != c': if c mod 36 differs, even positions
    * differ (7 invertible mod 36); else if c div 36 differs, odd
    * positions differ (11 invertible mod 36); the digit region
    * (positions 9..17, and the 7-char block slice 9..15) contains
    * both parities. Distinct maps for all pairs up to N = 36² =
    * 1296 copies — enforced by the require. At N ≤ 36 the odd-
    * position term is 0, so the cipher is bit-identical to the
    * pre-extension one (r9 probe artifacts remain comparable).
    */
  private[graft] def amplifyCustomer(spark: SparkSession, base: DataFrame, n: Int): DataFrame = {
    require(n <= 1296,
      s"amplifyCustomer cipher keyspace is 36^2 = 1296 copies; got $n")
    val ciphered = array_join(
      transform(split(col("c_name"), ""),
        (ch, i) => when(ch >= "0" && ch <= "9",
          lit("0123456789abcdefghijklmnopqrstuvwxyz")
            .substr((pmod(ascii(ch) - 48 + pmod(col("amp_copy"), lit(36)) * 7
                       + expr("amp_copy div 36") * 11 * pmod(i, lit(2)),
                     lit(36)) + 1).cast("int"),
                    lit(1))).otherwise(ch)), "")
    withCopies(spark, base, n)
      .withColumn("c_custkey", col("c_custkey") + col("amp_copy") * lit(KeyOffset))
      .withColumn("c_name", ciphered)
      .drop("amp_copy")
  }

  /** Per-copy token suffix: copy 0 keeps the original text; copy c
    * appends `_c<c>` to every whitespace token, changing every
    * shingle (cross-copy Jaccard 0) while keeping the within-copy
    * token-count/duplication structure isomorphic to the base.
    */
  private[graft] def amplifyDocuments(spark: SparkSession, base: DataFrame, n: Int): DataFrame =
    withCopies(spark, base, n)
      .withColumn("doc_id", col("doc_id") + col("amp_copy") * lit(KeyOffset))
      .withColumn("text",
        when(col("amp_copy") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("_c"), col("amp_copy"))), " ")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("amp_copy")

  /** Per-copy ±1 sign pattern over dimensions: an exact within-copy
    * isometry (all cosines/norms preserved bit-for-bit in structure)
    * that decorrelates cross-copy cosines to ~0. Copy 0 is identity.
    */
  private[graft] def amplifyEmbeddings(spark: SparkSession, base: DataFrame, n: Int): DataFrame = {
    val sign: (Column, Column) => Column = (c, i) =>
      (pmod(xxhash64(lit("amp"), c, i), lit(2)) * 2 - 1).cast("float")
    withCopies(spark, base, n)
      .withColumn("vec_id", col("vec_id") + col("amp_copy") * lit(KeyOffset))
      .withColumn("embedding",
        when(col("amp_copy") === 0, col("embedding"))
          .otherwise(zip_with(
            col("embedding"),
            transform(col("embedding"), (_, i) => sign(col("amp_copy"), i)),
            (v, s) => v * s)))
      .drop("amp_copy")
  }
}
