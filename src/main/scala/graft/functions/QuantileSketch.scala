package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Bottom-k-by-hash quantile sketch as a native `TypedImperativeAggregate`
  * — the quantile member of the sketch family (cardinality = KMVDistinct,
  * frequency = CMSketch, membership = BloomSketch): approximate
  * percentiles over 100 TB in ONE pass with fixed `k·16`-byte mergeable
  * state per group, where the exact form (`percentile`, DuckDB
  * `quantile_cont`) must buffer every row of the group.
  *
  * Estimator: keep the values of the k rows with the SMALLEST sampling
  * hash (a uniform random-but-deterministic row sample — bottom-k over a
  * per-row unique key is sampling without replacement), then interpolate
  * exact quantiles over the retained sample. Rank error concentrates at
  * ~1/√k (Hoeffding), the same k-vs-accuracy dial as KMV. Unlike
  * GK/KLL/t-digest the result is a pure function of the input SET —
  * order- and partitioning-independent, no RNG — so a DuckDB oracle
  * reproduces it bit-for-bit (`row_number() OVER (ORDER BY hv) <= k`
  * then `quantile_cont`), keeping the sketch inside the exact-compare
  * gate. Interpolation is the SQL-standard continuous quantile in
  * DuckDB's exact arithmetic shape — `v[lo]·(1−f) + v[hi]·f` with
  * `h = p·(n−1), f = h − ⌊h⌋` — measured bit-equal to `quantile_cont`
  * across sizes 1..501 (QuantileSketchSpec pins the parity claim
  * against Spark's own exact `percentile`, which uses the algebraically
  * equal `lo + (hi−lo)·f` form — 1-ulp apart in general, absorbed by
  * the query-side round-6).
  *
  * Like the rest of the family the operator is hash-agnostic: the
  * sampling column is an already-hashed LongType (portable_hash64 of the
  * row's unique id for oracle runs, xxhash64 in production). Hash ties
  * (two rows sharing a sampling key) keep the smaller value — an
  * order-independent rule, so determinism survives even a non-unique
  * key column.
  */
case class QuantileSketch(
    hashChild: Expression,
    valueChild: Expression,
    k: Int,
    ps: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Double]] {

  override def children: Seq[Expression] = Seq(hashChild, valueChild)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hashChild.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"sample_quantiles: sampling hash must be bigint, got ${hashChild.dataType.catalogString}")
    else if (valueChild.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"sample_quantiles: value must be double, got ${valueChild.dataType.catalogString}")
    else if (k < 2 || k > (1 << 20))
      TypeCheckResult.TypeCheckFailure(s"sample_quantiles: k must be in [2, 2^20], got $k")
    else if (ps.isEmpty || ps.exists(p => p < 0.0 || p > 1.0 || p.isNaN))
      TypeCheckResult.TypeCheckFailure(
        s"sample_quantiles: percentiles must be in [0, 1], got ${ps.mkString(",")}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // null only for an all-null / empty group (same contract as percentile)
  override def nullable: Boolean = true
  override def prettyName: String = "sample_quantiles"

  override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Double] =
    new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  private def put(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                  h: java.lang.Long, v: java.lang.Double): Unit = {
    val prev = buf.get(h)
    if (prev == null || v < prev) buf.put(h, v)
    if (buf.size > k) buf.pollLastEntry()
  }

  override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                      input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null)
      put(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeMap[java.lang.Long, java.lang.Double],
                     other: java.util.TreeMap[java.lang.Long, java.lang.Double]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    other.forEach((h, v) => put(buf, h, v))
    buf
  }

  override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Any =
    if (buf.isEmpty) null
    else {
      val vals = new Array[Double](buf.size)
      var i = 0
      buf.forEach((_, v) => { vals(i) = v; i += 1 })
      java.util.Arrays.sort(vals)
      val n = vals.length
      new GenericArrayData(ps.map { p =>
        val h = p * (n - 1)
        val lo = math.floor(h).toInt
        val hi = math.min(lo + 1, n - 1)
        val f = h - lo
        vals(lo) * (1.0 - f) + vals(hi) * f
      }.toArray)
    }

  override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.forEach((h, v) => { bb.putLong(h); bb.putDouble(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.put(bb.getLong, bb.getDouble))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileSketch =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
}

object QuantileSketch {
  /** `sample_quantiles(hash_col, value_col[, k, array(p, ...)])` — k and
    * the percentile array must be literals (validated with a real
    * message, same discipline as the other sketch builders). Defaults:
    * k = 128, ps = [0.5].
    */
  private[functions] def fromExprs(exprs: Seq[Expression]): QuantileSketch =
    exprs match {
      case Seq(h, v) => QuantileSketch(h, v, 128, Seq(0.5))
      case Seq(h, v, kLit, psLit) =>
        val ps = psLit match {
          case e if e.foldable && e.dataType.isInstanceOf[ArrayType] =>
            val arr = e.eval(InternalRow.empty).asInstanceOf[ArrayData]
            e.dataType.asInstanceOf[ArrayType].elementType match {
              case DoubleType => arr.toDoubleArray().toSeq
              case other => throw new IllegalArgumentException(
                s"sample_quantiles: percentiles must be array<double>, got array<${other.catalogString}>")
            }
          case _ => throw new IllegalArgumentException(
            "sample_quantiles: percentiles must be an array<double> literal")
        }
        QuantileSketch(h, v, CMSketch.intLit(kLit, "sample_quantiles", "k"), ps)
      case _ => throw new IllegalArgumentException(
        "sample_quantiles expects (hash_col, value_col) or (hash_col, value_col, k, array(p, ...))")
    }

  /** Idempotent SQL registration: `sample_quantiles(hv, val[, k, ps])`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sample_quantiles", fromExprs, "built-in")
}
