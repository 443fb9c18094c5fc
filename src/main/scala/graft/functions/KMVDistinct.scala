package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native
  * `TypedImperativeAggregate` — the SURVEY §7.5 "sketch at the custom-
  * Catalyst tier" component (100 TB cardinality estimation in one pass,
  * fixed 8k-byte state per group, mergeable across partitions).
  *
  * Estimator (Bar-Yossef et al., "Counting distinct elements in a data
  * stream", RANDOM 2002): keep the k smallest DISTINCT hash values of a
  * uniform 60-bit hash; if fewer than k exist the count is exact, else
  * D̂ = (k-1) · 2⁶⁰ / h_k. Unlike HLL the result is a deterministic pure
  * function of the input SET — partitioning- and order-independent — so
  * a DuckDB oracle reproduces it bit-for-bit (row_number over sorted
  * distinct hashes), keeping the sketch inside the exact-compare gate.
  *
  * Input is the already-hashed LongType column (compose with
  * `TextOps.portableHash64Sql` for oracle runs or `xxhash64` in
  * production — the operator is hash-agnostic like the dedup family:
  * update() masks every hash into [0, 2⁶⁰), identity for the portable
  * hash and a uniform fold for full-range 64-bit hashes).
  */
case class KMVDistinct(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 64)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && k >= 2) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires (bigint column, k >= 2), got ${child.dataType.catalogString}, k=$k")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      // mask into the estimator's [0, 2^60) hash space: identity for the
      // portable 60-bit hash (oracle parity unchanged), and maps full-
      // range/negative hashes (xxhash64 in production) onto the uniform
      // nonnegative domain the (k-1)·2^60/h_k estimator assumes — without
      // this, signed ordering makes the estimate negative garbage
      buf.add(v.asInstanceOf[Long] & KMVDistinct.HashMask)
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long], other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * KMVDistinct.HashSpace / buf.last().toDouble

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.add(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMVDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMVDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMVDistinct =
    copy(child = newChild)
}

object KMVDistinct {
  /** The estimator hash space: [0, 2⁶⁰). The portable hash lands here
    * natively; other hashes are masked in. Exactly representable in a
    * double.
    */
  val HashSpace: Double = (1L << 60).toDouble
  val HashMask: Long = (1L << 60) - 1

  /** SQL-builder shared by register() and GraftExtensions: k defaults to
    * 64 when omitted, accepts int/long literals, rejects non-literals
    * with a real message (instead of IndexOutOfBounds/ClassCast on
    * `kmv_distinct(hv)` or a bigint k).
    */
  private[functions] def fromExprs(exprs: Seq[Expression]): KMVDistinct = {
    val k = exprs.drop(1).headOption.map {
      case e if e.foldable => e.eval(InternalRow.empty) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long    => l.intValue
        case other => throw new IllegalArgumentException(
          s"kmv_distinct: k must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "kmv_distinct: k must be a literal, not a column")
    }.getOrElse(64)
    KMVDistinct(exprs.head, k)
  }

  /** Idempotent SQL registration: `kmv_distinct(hash_col[, k])`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct", fromExprs, "built-in")
}
