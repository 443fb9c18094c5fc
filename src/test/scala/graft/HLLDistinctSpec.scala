package graft

import org.apache.spark.sql.functions._
import graft.functions.HLLDistinct

/** Properties of the HLL TypedImperativeAggregate: register/estimate
  * parity with a hand-rolled reference, linear-counting small-range
  * behavior, partitioning-independence (register max survives arbitrary
  * merges), duplicate-insensitivity without a distinct pass, and
  * estimator accuracy on real portable hashes.
  */
class HLLDistinctSpec extends SparkSpec {

  private def est(df: org.apache.spark.sql.DataFrame, p: Int): Double = {
    HLLDistinct.register(spark)
    df.agg(expr(s"hll_distinct(hv, $p)")).head().getDouble(0)
  }

  /** Reference estimator: straight transcription of the Flajolet
    * formulas over a scala Map — no bit tricks, no integer-sum
    * rearrangement — to pin the aggregate's optimized path.
    */
  private def reference(hashes: Seq[Long], p: Int): Double = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    val reg = new Array[Int](m)
    hashes.foreach { h0 =>
      val h = h0 & ((1L << 60) - 1)
      val bucket = (h & (m - 1)).toInt
      val rest = h >>> p
      val rho = if (rest == 0L) maxRho
        else java.lang.Long.toBinaryString(rest).length match { case bl => maxRho - bl }
      if (rho > reg(bucket)) reg(bucket) = rho
    }
    val alpha = m match {
      case 16 => 0.673; case 32 => 0.697; case 64 => 0.709
      case n => 0.7213 / (1.0 + 1.079 / n)
    }
    val s = reg.map(r => 1L << (maxRho - r)).sum
    val v = reg.count(_ == 0)
    val raw = alpha * (m.toDouble * m.toDouble) * (1L << maxRho).toDouble / s.toDouble
    if (raw <= 2.5 * m && v > 0) m.toDouble * Math.log(m.toDouble / v) else raw
  }

  test("aggregate matches the hand-rolled reference bit-for-bit, both branches") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (n <- Seq(5, 40, 200, 5000)) {
      val hashes = (1 to n).map(_ => rnd.nextLong() & ((1L << 60) - 1))
      val e = est(hashes.toDF("hv"), 6)
      assert(e === reference(hashes, 6), s"n=$n")
    }
  }

  test("small-range branch: linear counting formula on a tiny set") {
    import spark.implicits._
    // 3 distinct hashes landing in 3 distinct buckets -> V = 61
    val hashes = Seq(1L, 2L, 3L)
    val e = est(hashes.toDF("hv"), 6)
    assert(e === 64.0 * Math.log(64.0 / 61.0))
  }

  test("duplicates are free: no distinct pass needed") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val distinct = (1 to 400).map(_ => rnd.nextLong() & ((1L << 60) - 1))
    val dups = distinct ++ distinct ++ distinct
    assert(est(distinct.toDF("hv"), 6) === est(dups.toDF("hv"), 6))
  }

  test("estimate is partitioning-independent (register max is order-free)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val hashes = (1 to 3000).map(_ => rnd.nextLong() & ((1L << 60) - 1))
    val a = est(hashes.toDF("hv").repartition(1), 6)
    val b = est(hashes.toDF("hv").repartition(32), 6)
    val c = est(scala.util.Random.shuffle(hashes).toDF("hv").repartition(5), 6)
    assert(a === b && b === c)
  }

  test("estimator lands near the true cardinality on portable hashes") {
    import spark.implicits._
    graft.ops.TextOps.ensureFunctions(spark)
    val df = (1 to 20000).map(i => s"token_$i").toDF("s")
      .select(expr(graft.ops.TextOps.portableHash64Sql("'t'", "s")).as("hv"))
    // p=10 (m=1024) -> sigma ~ 1.04/sqrt(m) ~ 3.3%; allow ~4 sigma
    val e = est(df, 10)
    assert(math.abs(e - 20000.0) / 20000.0 < 0.15, s"estimate $e")
  }

  test("oracle bit-length identity: 55 - length(bin(x)) equals the nlz rho") {
    // the DuckDB oracle derives rho from the binary-string length; prove
    // the identity against numberOfLeadingZeros on the boundary values
    for (rest <- Seq(1L, 2L, 3L, 4L, 7L, 8L, (1L << 53) - 1, 1L << 53, (1L << 54) - 1)) {
      val viaNlz = 55 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      val viaBin = 55 - java.lang.Long.toBinaryString(rest).length
      assert(viaNlz === viaBin, s"rest=$rest")
    }
  }
}
