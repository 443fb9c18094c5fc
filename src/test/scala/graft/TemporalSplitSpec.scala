package graft

import org.apache.spark.sql.functions._
import graft.ops.TemporalSplit

class TemporalSplitSpec extends SparkSpec {

  test("splits are disjoint, exhaustive, with reference boundary semantics") {
    import spark.implicits._
    val n = 400
    val df = (0 until n).map(i => (i.toLong, s"2023-01-01 00:00:00"))
      .toDF("id", "s")
      .withColumn("ts", expr("timestampadd(DAY, CAST(id AS INT), to_timestamp(s))"))
    val (tr, va, te) = TemporalSplit.split(df, "ts", TemporalSplit.Spec(90, 90))
    val (nt, nv, ne) = (tr.count(), va.count(), te.count())
    assert(nt + nv + ne === n.toLong)
    // max = day 399; testing = [day 309, day 399] closed -> 91 rows;
    // validation = [day 219, day 309) -> 90 rows; training = < day 219
    assert(ne === 91L)
    assert(nv === 90L)
    assert(nt === 219L)
    val trIds = tr.select("id").as[Long].collect().toSet
    val vaIds = va.select("id").as[Long].collect().toSet
    val teIds = te.select("id").as[Long].collect().toSet
    assert((trIds & vaIds).isEmpty && (vaIds & teIds).isEmpty && (trIds & teIds).isEmpty)
  }
}
