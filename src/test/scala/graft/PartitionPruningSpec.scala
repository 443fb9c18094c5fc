package graft

import org.apache.spark.sql.functions._

/** Date-partitioned layout + partition pruning — the 100 TB scan story:
  * a day-filtered query must touch one partition directory, not the
  * table. Asserted on PartitionFilters in the executed plan.
  */
class PartitionPruningSpec extends SparkSpec {

  test("day filter prunes to one partition of a date-partitioned table") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events_part").toString
    val events = (0 until 1000).map(i => (i.toLong, 1 + i % 10, i % 7))
      .toDF("id", "day", "v")
    events.write.partitionBy("day").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).where(col("day") === 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("(day = 3)") || plan.contains("day#") && plan.contains("= 3"))
    assert(q.count() === 100L)
    // and the scan really reads 1 of 10 partition dirs
    val files = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(!files.contains("day=4"))
  }
}
