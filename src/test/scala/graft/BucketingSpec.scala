package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketed tables — the 100 TB fact-fact join
  * strategy: both sides bucketed on the join key join WITHOUT a shuffle
  * (SortMergeJoin directly over bucket files). Asserted on the plan.
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans no exchange") {
    import spark.implicits._
    // default warehouse (./spark-warehouse, gitignored); tables dropped after
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lines")
    val orders = (1L to 1000L).map(i => (i, i % 7)).toDF("okey", "status")
    val lines = (1L to 3000L).map(i => (i % 1000 + 1, i * 2)).toDF("okey", "qty")
    orders.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_orders")
    lines.write.bucketBy(8, "okey").sortBy("okey").saveAsTable("b_lines")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the shuffle-free bucketed SortMergeJoin (broadcast would win
    // on toy sizes; at fact-fact scale it is not an option)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lines"), "okey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === 3000L)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lines")
    }
  }
}
