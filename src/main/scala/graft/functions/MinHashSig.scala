package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(hashes, k, aBase, aStep, p)`: the k-row MinHash
  * signature of an array of 64-bit token hashes under the universal
  * hash family h_i(x) = (a_i * (x % p) + i) % p with a_i = aBase +
  * i * aStep — all k minima computed in ONE pass over the array.
  *
  * Native replacement for
  * `transform(sequence(0, k-1), i -> array_min(transform(hs, x -> ...)))`,
  * which walks the hash array once PER SIGNATURE ROW with every element
  * an interpreted tree eval (Catalyst never compiles lambda bodies) —
  * the same regression class as [[VecDot]]/[[SimHash32]]. Here the fused
  * loop is k multiply-mods per element inside whole-stage codegen.
  *
  * Semantics mirror the HOF bit-for-bit (TextOpsSpec pins them):
  *  - NULL array -> a signature of k NULL slots, NOT NULL (the outer
  *    transform runs over the non-null `sequence(0, k-1)`, so only the
  *    inner array_min sees the NULL array) — hence `nullable = false`
  *    and a hand-rolled eval/genCode instead of the null-shortcutting
  *    nullSafe helpers;
  *  - NULL element -> skipped (`array_min` ignores NULLs);
  *  - empty / all-NULL array -> a signature of k NULL slots.
  * `%` is Java remainder (sign of the dividend), matching both Spark's
  * integral `%` and DuckDB's — negative hashes (xxhash64 tier) agree
  * across engines. a_i * (x % p) stays under 2^62 for a_i < 2^31 and
  * p = 2^31 - 1, so the fold never overflows.
  */
case class MinHashSig(child: Expression, k: Int, aBase: Long, aStep: Long, p: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires an array<bigint> argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return new GenericArrayData(new Array[Any](k))
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val xm = arr.getLong(j) % p
        var i = 0
        while (i < k) {
          val h = ((aBase + i * aStep) * xm + i) % p
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(new Array[Any](k))
    else new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // per-operator-instance scratch: refilled per row, never reallocated;
    // the RESULT array is a fresh copy (rows must not share storage)
    val buf = ctx.addMutableState("long[]", "minhashMins", v => s"$v = new long[$k];")
    val childGen = child.genCode(ctx)
    val n = ctx.freshName("n")
    val j = ctx.freshName("j")
    val i = ctx.freshName("i")
    val xm = ctx.freshName("xm")
    val h = ctx.freshName("h")
    val any = ctx.freshName("any")
    val resultCode =
      code"""
        ${childGen.code}
        boolean $any = false;
        if (!${childGen.isNull}) {
          java.util.Arrays.fill($buf, Long.MAX_VALUE);
          final int $n = ${childGen.value}.numElements();
          for (int $j = 0; $j < $n; $j++) {
            if (!${childGen.value}.isNullAt($j)) {
              $any = true;
              final long $xm = ${childGen.value}.getLong($j) % ${p}L;
              for (int $i = 0; $i < $k; $i++) {
                final long $h = ((${aBase}L + $i * ${aStep}L) * $xm + $i) % ${p}L;
                if ($h < $buf[$i]) $buf[$i] = $h;
              }
            }
          }
        }
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $any
          ? new org.apache.spark.sql.catalyst.util.GenericArrayData((long[]) $buf.clone())
          : new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$k]);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private[functions] def fromExprs(exprs: Seq[Expression]): MinHashSig = {
    require(exprs.size == 5,
      s"minhash_sig expects (hashes, k, aBase, aStep, p), got ${exprs.size} args")
    def lit(e: Expression, what: String): Long = {
      require(e.foldable, s"minhash_sig: $what must be a literal")
      e.eval(InternalRow.empty) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long => l.longValue
        case other => throw new IllegalArgumentException(
          s"minhash_sig: $what must be an integer literal, got $other")
      }
    }
    val k = lit(exprs(1), "k").toInt
    val aBase = lit(exprs(2), "aBase")
    val aStep = lit(exprs(3), "aStep")
    val p = lit(exprs(4), "p")
    require(k > 0 && k <= 1024, s"minhash_sig: k must be in [1, 1024], got $k")
    // overflow-freedom needs BOTH bounds: every a_i in [0, 2^31) AND
    // |x % p| < 2^31 — a huge p (or a negative aStep driving |a_i| up)
    // would overflow a_i * (x % p) and return garbage signatures
    require(p > 0 && p <= Int.MaxValue.toLong,
      s"minhash_sig: p must be in (0, 2^31 - 1], got $p")
    require(aBase >= 0 && aStep >= 0 &&
      aBase + (k - 1).toLong * aStep < Int.MaxValue.toLong,
      s"minhash_sig: every a_i must lie in [0, 2^31) to keep a_i * (x % p) overflow-free")
    MinHashSig(exprs.head, k, aBase, aStep, p)
  }

  /** Idempotent per-session SQL registration of `minhash_sig`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", fromExprs, "built-in")
}
