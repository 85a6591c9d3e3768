package graft

import org.apache.spark.sql.SparkSession

/** The session-cache contract for this library, in one place.
  *
  * Operators with multi-consumer intermediates (dedup shingle rows,
  * LSH pair sets, the similarity corpus projections, token/gram
  * tables) materialize them via `persist` or `localCheckpoint` and
  * deliberately do NOT release them before returning: the returned
  * DataFrame still reads those blocks, and releasing them would
  * re-execute the whole pipeline on the caller's first action
  * (checkpointed frames would fail outright — their lineage is
  * truncated). Iterative operators ([[operators.Dedup.labelPropagation]])
  * free their own per-round generations and exit holding only the
  * result's blocks.
  *
  * So the contract is: blocks live until the CALLER is done with the
  * query's results, and the caller signals that by calling
  * [[releaseAll]] (as Verify does per query and Bench per run). A
  * long-lived shared session that never releases will accumulate one
  * query's worth of intermediates per distinct query plan.
  */
object Caches {

  /** Release every block this library (or anything else) left in the
    * session: cached Datasets via the catalog, plus directly persisted
    * RDDs — which covers `localCheckpoint` block sets, invisible to
    * `clearCache()` because they bypass the Dataset cache manager.
    */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  /** True when nothing is persisted at either layer — the post-release
    * invariant (asserted in CacheDisciplineSpec). Checks BOTH layers
    * explicitly: a catalog cache entry whose RDD has not yet
    * registered (cached but never materialized) has no persistent-RDD
    * footprint, so the RDD registry alone could report "empty" while
    * the Dataset cache still holds a plan.
    */
  def isEmpty(spark: SparkSession): Boolean =
    spark.sparkContext.getPersistentRDDs.isEmpty &&
      spark.sharedState.cacheManager.isEmpty

  /** localCheckpoint + the persistent-RDD id it registered, read
    * DIRECTLY off the returned plan: a checkpointed Dataset's logical
    * plan is the `LogicalRDD` wrapping the persisted internal RDD, so
    * the id attribution is exact with NO registry diff window. (The
    * pre-r15 implementation diffed `getPersistentRDDs` around the
    * call, which misattributed — and on release destroyed — blocks a
    * CONCURRENT materialization registered meanwhile; this version is
    * race-free, which is what lets [[Par]] overlap independent
    * checkpoint materializations per optimization-guide §2.6.)
    * Iterative operators use the ids to free superseded generations.
    */
  private[graft] def trackedCheckpoint(df: org.apache.spark.sql.DataFrame,
                                       eager: Boolean = true):
      (org.apache.spark.sql.DataFrame, Set[Int]) = {
    val ck = df.localCheckpoint(eager)
    val ids = ck.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => Set(lr.rdd.id)
      case _ => Set.empty[Int] // not reachable for a localCheckpoint result
    }
    (ck, ids)
  }

  /** Shared driver-paced loop harness: each generation is an EAGER
    * localCheckpoint; once generation i+1 has materialized, generation
    * i's blocks are FREED, so a loop exits holding only the final
    * state's blocks instead of one block set per round. The iterative
    * families (PageRank / PPR / eigencentrality / LPA communities —
    * plus the hand-rolled multi-state loops in HITS / BFS / k-core)
    * were the repeatedly-implicated envelope-pressure set in the
    * r10-r11 bench drift; a 5-round loop used to hold 5 generations
    * until the caller's releaseAll.
    */
  private[graft] def iterate(state0: org.apache.spark.sql.DataFrame,
                             rounds: Int)(
      step: (org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    var (state, ids) = trackedCheckpoint(state0)
    for (i <- 1 to rounds) {
      val (next, nextIds) = trackedCheckpoint(step(state, i))
      release(state.sparkSession, ids)
      state = next; ids = nextIds
    }
    state
  }

  /** Free exactly the given persistent-RDD ids (no-op for ids already
    * gone). */
  private[graft] def release(spark: SparkSession, ids: Set[Int]): Unit =
    ids.foreach(id =>
      spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
}
