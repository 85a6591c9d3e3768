package graft

import org.apache.spark.sql.functions._

/** Partitioned-layout pruning: at 100 TB the documents corpus would be
  * laid out partitioned by a low-cardinality selection key (language,
  * source, date), and a filtered query must read ONLY the matching
  * directories — the static sibling of the runtime bloom filter
  * (PlanSpec) and the third leg of the storage-layout story next to
  * bucketing (BucketingSpec). This proves it on the actual engine: a
  * lang-partitioned write, then a lang-filtered scan whose plan shows
  * the predicate as a PartitionFilter (not a post-scan data filter)
  * and whose file reads stay inside the one matching directory.
  */
class PartitionPruningSpec extends SparkSuite {

  test("a lang-filtered scan over a lang-partitioned table prunes to one directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      Tables.documents(spark, sfDir)
        .write.partitionBy("lang").mode("overwrite").parquet(dir)
      val langs = Tables.documents(spark, sfDir)
        .select("lang").distinct().collect().map(_.getString(0))
      assert(langs.length > 1, "corpus must have several partitions for the test to mean anything")
      val one = langs.min

      val q = spark.read.parquet(dir).filter(col("lang") === one)
      val plan = q.queryExecution.executedPlan.toString()
      assert(plan.contains("PartitionFilters: [isnotnull(lang"),
        s"lang predicate must prune partitions, not filter rows:\n${plan.take(2000)}")
      // row counts agree with the unpartitioned source
      val want = Tables.documents(spark, sfDir).filter(col("lang") === one).count()
      assert(q.count() == want, "pruned read returns exactly the partition's rows")
      // and the files actually read sit under lang=<one>/ only
      val files = q.queryExecution.executedPlan.collectLeaves()
        .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(f.partitionFilters, f.dataFilters)
            .flatMap(_.files.map(_.getPath.toString))
        }.flatten
      assert(files.nonEmpty && files.forall(_.contains(s"lang=$one")),
        s"scan lists files outside the pruned partition: ${files.take(3)}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
