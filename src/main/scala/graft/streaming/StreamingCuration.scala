package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.CorpusOps

/** The full incremental curation pass, composed from the streaming
  * dedup primitives — what a training-data pipeline runs on every
  * arriving crawl shard: Gopher-style quality gate
  * ([[CorpusOps.qualityKeep]], the SAME predicate as the batch
  * curation pipeline — one definition, no drift) → incremental exact
  * dedup into the survivor store ([[StreamingDedup]]) → incremental
  * near-dup detection against the fingerprint index
  * ([[StreamingNearDup]]).
  *
  * Each stage keeps its own idempotent per-batch-partition store, so
  * the composition inherits the replay safety of its parts; rejected
  * (low-quality) documents never reach either store, exactly like the
  * batch `curationPipeline`'s filter-before-dedup ordering — at 100 TB
  * the quality gate is the cheapest stage, so it runs first and
  * shrinks everything downstream.
  */
object StreamingCuration {

  /** foreachBatch body: curate one micro-batch of
    * `(doc_id, text, ...)` rows into the three stores.
    */
  def curateSink(survivorPath: String, indexPath: String,
                 pairsPath: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      val passed = batch.filter(CorpusOps.qualityKeep)
      StreamingDedup.survivorSink(survivorPath)(passed, batchId)
      StreamingNearDup.pairSink(indexPath, pairsPath)(passed, batchId)
  }
}
