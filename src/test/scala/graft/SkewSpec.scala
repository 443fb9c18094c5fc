package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew

class SkewSpec extends SparkSpec {

  test("salted count equals plain groupBy count under heavy skew") {
    import spark.implicits._
    // one hot key (90%) + long tail
    val df = ((1 to 9000).map(_ => "hot") ++ (1 to 1000).map(i => s"k${i % 50}"))
      .toDF("key")
    val plain = df.groupBy("key").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(df, col("key"), 16).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 9000L)
  }
}
