package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** HyperLogLog distinct-count sketch as a native
  * `TypedImperativeAggregate` — the register-based companion to
  * [[KMVDistinct]] (SURVEY §7.5 sketch tier). Where KMV keeps the k
  * smallest distinct hashes (k·8 B state, needs a distinct pass or a
  * TreeSet insert per row), HLL keeps a DENSE m-byte register file and
  * its update is two bit-ops + a byte max — order- and duplicate-
  * insensitive, so the input needs NO pre-distinct and the merge is an
  * element-wise max. At 100 TB that is the difference between shuffling
  * distinct hash sets and shuffling fixed 64-byte buffers: one partial
  * aggregate per partition, one tiny final merge, regardless of group
  * skew or duplicate rate.
  *
  * Estimator (Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm", AofA
  * 2007): bucket = low p bits of a uniform hash, rho = leading-zero
  * count of the remaining bits + 1, register = max rho per bucket;
  * E = α_m · m² / Σ_j 2^(−M_j), with the small-range linear-counting
  * correction E ≤ 2.5m ∧ V>0 → m·ln(m/V) (V = empty registers). The
  * 2^60 hash space dwarfs every register (≤ 2^55 per bucket at p=6),
  * so the paper's large-range correction never fires and is omitted.
  *
  * Cross-engine determinism: the hash is the portable 60-bit md5
  * prefix ([[PortableHash64]]), and the register-file sum is computed
  * as the EXACT integer S = Σ_j 2^(maxRho − M_j) (≤ m·2^55 < 2^63), so
  * both engines reach the estimate through ONE double division of
  * identical operands — no float accumulation order to drift. The
  * linear-counting branch uses ln(), which libms may round apart by an
  * ulp, but all 63 possible m=64 outputs sit ≥ 1e-6·|x| away from a
  * 6-decimal rounding boundary (checked exhaustively), so round(·, 6)
  * is deterministic there too. A DuckDB oracle replays the registers
  * with `max(rho)` GROUP BY bucket and `length(bin(x))` for the exact
  * bit length (both engines' bin() drops leading zeros).
  *
  * Input is the already-hashed LongType column, masked into [0, 2^60)
  * exactly like KMV (identity for the portable hash; folds xxhash64's
  * full range uniformly for production runs).
  */
case class HLLDistinct(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  def this(child: Expression) = this(child, 6)

  private def m: Int = 1 << p
  /** rho when the non-bucket bits are all zero: (60 - p) zeros + 1. */
  private def maxRho: Int = 60 - p + 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType && p >= 4 && p <= 16) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_distinct requires (bigint column, p in [4, 16]), got ${child.dataType.catalogString}, p=$p")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Long] & KMVDistinct.HashMask
      val bucket = (hv & (m - 1)).toInt
      val rest = hv >>> p
      // bit length of `rest` is 64 - nlz; rho = (60-p) - bitlen + 1
      val rho =
        if (rest == 0L) maxRho
        else maxRho - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < buf.length) {
      if (other(j) > buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    // exact integer register sum: S = sum_j 2^(maxRho - M_j) <= m * 2^55
    var s = 0L
    var v = 0
    var j = 0
    while (j < buf.length) {
      s += 1L << (maxRho - buf(j))
      if (buf(j) == 0) v += 1
      j += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case n  => 0.7213 / (1.0 + 1.079 / n)
    }
    // E = alpha * m^2 / sum 2^-M = alpha * m^2 * 2^maxRho / S
    val raw = alpha * (m.toDouble * m.toDouble) * (1L << maxRho).toDouble / s.toDouble
    if (raw <= 2.5 * m && v > 0) m.toDouble * Math.log(m.toDouble / v)
    else raw
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HLLDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HLLDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HLLDistinct =
    copy(child = newChild)
}

object HLLDistinct {

  /** SQL builder: `hll_distinct(hash_col[, p])`, p defaulting to 6
    * (m = 64 registers) — same literal-argument discipline as
    * [[KMVDistinct.fromExprs]].
    */
  private[functions] def fromExprs(exprs: Seq[Expression]): HLLDistinct = {
    val p = exprs.drop(1).headOption.map {
      case e if e.foldable => e.eval(InternalRow.empty) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long    => l.intValue
        case other => throw new IllegalArgumentException(
          s"hll_distinct: p must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "hll_distinct: p must be a literal, not a column")
    }.getOrElse(6)
    HLLDistinct(exprs.head, p)
  }

  /** Idempotent SQL registration: `hll_distinct(hash_col[, p])`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_distinct", fromExprs, "built-in")
}
