package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter (Bloom, CACM 1970) as a native `TypedImperativeAggregate`
  * — the membership member of the sketch family (KMVDistinct =
  * cardinality, CMSketch = frequency): fixed `mBits/64` longs of bitset
  * state per group, mergeable by element-wise OR, one pass with
  * map-side-combined partials. The 100 TB use is JOIN PRUNING: build the
  * filter over the keys of a filtered-but-not-broadcastable join side
  * (one ~KB-MB buffer instead of a distinct-key set), broadcast it, and
  * semi-prune the fact scan BEFORE its shuffle — the persistable,
  * cross-job analog of Spark's own runtime bloom-join injection. No
  * false negatives ever; false positives pass the prune and are removed
  * by the real join that follows.
  *
  * Hash-agnostic like CMSketch: input is the already-hashed LongType
  * column, masked into [0, 2⁶⁰); the `k` probe positions are DISJOINT
  * 12-bit-strided windows of that hash — `pos_j = (h >>> (12·j)) &
  * (mBits-1)` — so a DuckDB oracle reproduces the exact bitset (and
  * every probe verdict) with a shift and a mask. Requires mBits a power
  * of two and `12·(k-1) + log2(mBits) <= 60` so each probe reads fresh
  * digest bits.
  *
  * eval() emits the raw bitset (little-endian within each long,
  * `mBits/64` longs); probing is [[BloomSketch.mightContainSql]] — pure
  * codegen'd integer ops per row against the broadcast scalar, no UDF.
  */
case class BloomSketch(
    child: Expression,
    mBits: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 4096, 4)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch requires a bigint column, got ${child.dataType.catalogString}")
    else if (mBits < 64 || (mBits & (mBits - 1)) != 0 || k < 1)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch requires mBits a power of two >= 64 and k >= 1, got mBits=$mBits k=$k")
    else if (12 * (k - 1) + java.lang.Long.numberOfTrailingZeros(mBits.toLong) > 60)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_sketch probe windows exceed the 60-bit space: 12*(k-1)+log2(mBits) must be <= 60")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] & KMVDistinct.HashMask
      var j = 0
      while (j < k) {
        val pos = ((h >>> (12 * j)) & (mBits - 1)).toInt
        buf(pos >>> 6) |= 1L << (pos & 63)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
}

object BloomSketch {

  /** Probe fragment: true iff every one of the `k` strided-window
    * positions of `hvSql` is set in the `bloomSql` bitset column. Pure
    * built-in integer ops (element_at/shiftright/mask) so the probe
    * stays inside whole-stage codegen — the per-row cost of the prune
    * is ~3k integer ops against a broadcast scalar.
    */
  def mightContainSql(bloomSql: String, hvSql: String, mBits: Int, k: Int): String =
    (0 until k).map { j =>
      val pos = s"(shiftright($hvSql, ${12 * j}) & ${mBits - 1})"
      s"((shiftright(element_at($bloomSql, CAST($pos div 64 AS INT) + 1), " +
        s"CAST($pos % 64 AS INT)) & 1) = 1)"
    }.mkString("(", " AND ", ")")

  /** SQL-builder: `bloom_sketch(hash_col[, mBits, k])`, literal knobs
    * validated here (same discipline as KMVDistinct/CMSketch.fromExprs;
    * out-of-Int-range BIGINT literals are rejected, not truncated).
    */
  private[functions] def fromExprs(exprs: Seq[Expression]): BloomSketch =
    exprs match {
      case Seq(h)       => BloomSketch(h, 4096, 4)
      case Seq(h, m, c) => BloomSketch(h,
        CMSketch.intLit(m, "bloom_sketch", "mBits"),
        CMSketch.intLit(c, "bloom_sketch", "k"))
      case _ => throw new IllegalArgumentException(
        "bloom_sketch expects (hash_col) or (hash_col, mBits, k)")
    }

  /** Idempotent SQL registration: `bloom_sketch(hash_col[, mBits, k])`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_sketch", fromExprs, "built-in")
}
