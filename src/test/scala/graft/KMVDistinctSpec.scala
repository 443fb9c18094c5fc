package graft

import org.apache.spark.sql.functions._
import graft.functions.KMVDistinct

/** Properties of the KMV TypedImperativeAggregate: exactness below k,
  * partitioning-independence (set semantics survive arbitrary merges),
  * and estimator accuracy on uniform hashes.
  */
class KMVDistinctSpec extends SparkSpec {

  private def est(df: org.apache.spark.sql.DataFrame, k: Int): Double = {
    KMVDistinct.register(spark)
    df.agg(expr(s"kmv_distinct(hv, $k)")).head().getDouble(0)
  }

  test("below k the count is exact, duplicates ignored") {
    import spark.implicits._
    val df = (1 to 30).flatMap(i => Seq(i.toLong, i.toLong)).toDF("hv")
    assert(est(df, 64) === 30.0)
  }

  test("estimate is partitioning-independent (pure function of the set)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val hashes = (1 to 5000).map(_ => rnd.nextLong() & ((1L << 60) - 1))
    val a = est(hashes.toDF("hv").repartition(1), 64)
    val b = est(hashes.toDF("hv").repartition(32), 64)
    val c = est(scala.util.Random.shuffle(hashes).toDF("hv").repartition(7), 64)
    assert(a === b && b === c)
  }

  test("GraftExtensions injects both native functions without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext) // would throw on a bad builder
  }

  test("estimator lands near the true cardinality on uniform 60-bit hashes") {
    import spark.implicits._
    // real-shaped input: portable hash of 20k distinct strings
    graft.ops.TextOps.ensureFunctions(spark)
    val df = (1 to 20000).map(i => s"token_$i").toDF("s")
      .select(expr(graft.ops.TextOps.portableHash64Sql("'t'", "s")).as("hv"))
    val e = est(df, 256)
    // k=256 → relative error ~1/sqrt(k-1) ≈ 6.3%; allow 4 sigma
    assert(math.abs(e - 20000.0) / 20000.0 < 0.25, s"estimate $e")
  }
}
