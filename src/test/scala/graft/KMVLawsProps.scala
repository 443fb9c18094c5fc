package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.LongType
import graft.functions.KMVDistinct

/** ScalaCheck laws for the KMV TypedImperativeAggregate, exercised
  * directly on the aggregation buffer (no Spark session): closed-form
  * agreement, merge associativity under arbitrary partitionings (the
  * property that makes the sketch distributable), and serde roundtrip.
  */
object KMVLawsProps extends Properties("KMVDistinct") {

  private val M = 1L << 60
  private def agg(k: Int) = KMVDistinct(BoundReference(0, LongType, nullable = true), k)

  private val genVals: Gen[List[Long]] = for {
    n <- Gen.choose(0, 400)
    vs <- Gen.listOfN(n, Gen.choose(0L, M - 1))
  } yield vs
  private val genK: Gen[Int] = Gen.choose(2, 64)

  private def closedForm(vs: List[Long], k: Int): Double = {
    val d = vs.distinct.sorted
    if (d.size < k) d.size.toDouble
    else (k - 1).toDouble * M.toDouble / d(k - 1).toDouble
  }

  private def run(vs: Seq[Long], k: Int): Double = {
    val a = agg(k)
    val buf = a.createAggregationBuffer()
    vs.foreach(v => a.update(buf, InternalRow(v)))
    a.eval(buf).asInstanceOf[Double]
  }

  property("equals the closed form over the distinct sorted set") =
    Prop.forAll(genVals, genK) { (vs, k) => run(vs, k) == closedForm(vs, k) }

  property("full-range (negative) hashes are masked into the estimator domain") =
    Prop.forAll(Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)), genK) { (vs, k) =>
      val got = run(vs, k)
      got == closedForm(vs.map(_ & KMVDistinct.HashMask), k) && got >= 0.0
    }

  property("any chunked merge equals the single-pass result") =
    Prop.forAll(genVals, genK, Gen.choose(1, 7)) { (vs, k, chunks) =>
      val a = agg(k)
      val parts = vs.grouped(math.max(1, (vs.size + chunks - 1) / chunks)).toList
      val bufs = parts.map { p =>
        val b = a.createAggregationBuffer()
        p.foreach(v => a.update(b, InternalRow(v)))
        b
      }
      val merged = bufs.foldLeft(a.createAggregationBuffer())(a.merge)
      a.eval(merged).asInstanceOf[Double] == run(vs, k)
    }

  property("serialize/deserialize preserves the buffer") =
    Prop.forAll(genVals, genK) { (vs, k) =>
      val a = agg(k)
      val buf = a.createAggregationBuffer()
      vs.foreach(v => a.update(buf, InternalRow(v)))
      a.eval(a.deserialize(a.serialize(buf))) == a.eval(buf)
    }
}
