package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * native `TypedImperativeAggregate` — the frequency twin of the KMV
  * cardinality sketch (KMVDistinct.scala): fixed `depth × width` longs of
  * state per group, mergeable by element-wise add, one pass over 100 TB
  * with no per-token shuffle (map-side partials collapse each partition
  * to one buffer before the exchange). Point estimate for a key is
  * `min over r of counter[r][bucket_r(key)]` — an upper bound on the true
  * count that is exact for keys with no bucket collision in some row.
  *
  * Like the dedup/KMV family the operator is hash-agnostic: input is the
  * already-hashed LongType column (portable_hash64 for oracle runs,
  * xxhash64 in production), masked into [0, 2⁶⁰). The `depth` row hashes
  * are DISJOINT 12-bit-strided windows of that hash —
  * `bucket_r = (h >>> (12·r)) & (width-1)` — so a DuckDB oracle
  * reproduces the whole sketch with two shifts and the driver gate
  * compares estimates bit-for-bit (no RNG, no seed table to ship).
  * Requires width a power of two and `12·(depth-1) + log2(width) <= 60`
  * so every row reads fresh digest bits (md5 bits are uniform; disjoint
  * windows give the independent-hash family the estimator assumes).
  *
  * eval() emits the raw counter array (row-major, `depth · width` longs)
  * rather than a fixed probe's estimate: the sketch is built once and
  * probed many times (heavy-hitter candidates, a monitoring dashboard, a
  * join-cardinality estimate), and the probe is three integer ops per row
  * on a broadcast scalar — see TextQueries.sketchHeavyHitters.
  */
case class CMSketch(
    child: Expression,
    weight: Option[Expression],
    depth: Int,
    width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  def this(child: Expression) = this(child, None, 4, 1024)

  override def children: Seq[Expression] = child +: weight.toSeq

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires a bigint column, got ${child.dataType.catalogString}")
    else if (weight.exists(_.dataType != LongType))
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch weight must be bigint, got ${weight.get.dataType.catalogString}")
    else if (depth < 1 || width < 2 || (width & (width - 1)) != 0)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires depth >= 1 and width a power of two >= 2, got depth=$depth width=$width")
    else if (12 * (depth - 1) + java.lang.Long.numberOfTrailingZeros(width.toLong) > 60)
      TypeCheckResult.TypeCheckFailure(
        s"cms_sketch row hashes exceed the 60-bit space: 12*(depth-1)+log2(width) must be <= 60")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // weighted form: a pre-aggregated (key, count) rollup builds the
      // SAME sketch as one update per occurrence (addition commutes) —
      // a null or negative weight contributes nothing (F4 posture)
      val w = weight match {
        case None => 1L
        case Some(we) => we.eval(input) match {
          case null => 0L
          case x    => math.max(0L, x.asInstanceOf[Long])
        }
      }
      if (w > 0L) {
        val h = v.asInstanceOf[Long] & KMVDistinct.HashMask
        var r = 0
        while (r < depth) {
          buf(r * width + ((h >>> (12 * r)) & (width - 1)).toInt) += w
          r += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CMSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CMSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CMSketch =
    copy(child = newChildren.head, weight = newChildren.lift(1))
}

object CMSketch {

  /** SQL-builder: `cms_sketch(hash_col[, depth, width])`, literal args
    * validated here (same discipline as KMVDistinct.fromExprs). BIGINT
    * literals outside Int range are rejected, not truncated — a
    * silently-wrapped width would build a different geometry than the
    * caller (and their oracle mirror) wrote.
    */
  private[functions] def intLit(e: Expression, fn: String, what: String): Int = e match {
    case e if e.foldable => e.eval(InternalRow.empty) match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long if l >= Int.MinValue && l <= Int.MaxValue => l.intValue
      case other => throw new IllegalArgumentException(
        s"$fn: $what must be an int-range integer literal, got $other")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: $what must be a literal, not a column")
  }

  private[functions] def fromExprs(exprs: Seq[Expression]): CMSketch =
    exprs match {
      case Seq(h)       => CMSketch(h, None, 4, 1024)
      case Seq(h, d, w) => CMSketch(h, None,
        intLit(d, "cms_sketch", "depth"), intLit(w, "cms_sketch", "width"))
      case _ => throw new IllegalArgumentException(
        "cms_sketch expects (hash_col) or (hash_col, depth, width)")
    }

  /** `cms_sketch_weighted(hash_col, weight_col[, depth, width])` — the
    * pre-aggregated form: one row per (key, count) rollup instead of one
    * per occurrence; bit-identical output (CMSSpec pins it).
    */
  private[functions] def fromExprsWeighted(exprs: Seq[Expression]): CMSketch =
    exprs match {
      case Seq(h, wt)       => CMSketch(h, Some(wt), 4, 1024)
      case Seq(h, wt, d, w) => CMSketch(h, Some(wt),
        intLit(d, "cms_sketch_weighted", "depth"),
        intLit(w, "cms_sketch_weighted", "width"))
      case _ => throw new IllegalArgumentException(
        "cms_sketch_weighted expects (hash_col, weight_col[, depth, width])")
    }

  /** Idempotent SQL registration of both forms. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch", fromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch_weighted", fromExprsWeighted, "built-in")
  }
}
