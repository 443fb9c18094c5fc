package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native vector kernels for the embedding family (preferred extension
  * tier: custom `Expression` with `doGenCode`).
  *
  * Why not `zip_with`/`aggregate` HOFs: Catalyst never compiles lambda
  * bodies — every element costs an interpreted tree walk (the r6 verdict
  * measured embed_hyperplane_recall at 16.7 s against a 1.0 s twin).
  * Why not unrolled per-element scalar trees: at dim=64 a single dot is
  * ~130 expression nodes, and a bucket over 8 planes ~1k — enough to
  * push a Generate/Project consume method past janino's 64 KB limit,
  * which silently disables whole-stage codegen for the ENTIRE stage
  * (measured: embed_banded_recall 2.4 s → 6.4 s). A native expression
  * is constant code size at any dim: the generated code is one tight
  * loop the JIT can vectorize, inside whole-stage codegen.
  */
object VectorExprs {

  /** Idempotent per-session SQL registration of `vec_dot` and
    * `hyperplane_bucket`.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", VecDot.fromExprs, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_bucket", HyperplaneBucket.fromExprs, "built-in")
  }
}

/** `vec_dot(a, b)`: dot product of two double arrays. NULL on length
  * mismatch or a NULL element — matching the
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, +)` fold it replaces
  * (zip_with pads the shorter side with NULL, and NULL poisons the sum),
  * so oracle-checked results are unchanged. Accumulation is ascending-
  * index, bit-identical to the old fold (IEEE: 0.0 + x = x).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> arguments, got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  private[functions] def fromExprs(exprs: Seq[Expression]): VecDot = {
    require(exprs.size == 2, s"vec_dot expects (array, array), got ${exprs.size} args")
    VecDot(exprs(0), exprs(1))
  }
}

/** `vec_dot_n(a, b, n)`: dot product of the first `n` elements of two
  * double arrays — the prefix-dim (Matryoshka) kernel. Equivalent to
  * `vec_dot(slice(a, 1, n), slice(b, 1, n))` but without materializing
  * two sliced array copies per pair (slice allocates a GenericArrayData
  * each call — measurable when the scorer evaluates several prefixes
  * per candidate pair). NULL if either array is shorter than n or a
  * read element is NULL; same ascending-index IEEE fold as [[VecDot]].
  * `n` is a plan-time literal (the prefix dim is a query constant).
  */
case class VecDotN(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) if n > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
      TypeCheckResult.TypeCheckFailure(s"vec_dot_n requires n > 0, got $n")
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"vec_dot_n requires two array<double> arguments, got (${l.catalogString}, ${r.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_n"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() < n || y.numElements() < n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() < $n || $b.numElements() < $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotN =
    copy(left = newLeft, right = newRight)
}

/** `hyperplane_bucket(v, bits, seed, dim[, planeOffset])`: random-
  * hyperplane LSH code — bit b set iff v · r_(planeOffset+b) >= 0, for
  * `bits` planes whose components are seeded murmur3-derived constants
  * in [-1, 1] (see [[HyperplaneBucket.planes]]). The plane matrix is a
  * pure function of (bits, seed, dim, planeOffset) regenerated at
  * expression-build time and shipped inside the serialized plan (a few
  * KB — the cluster analog of a tiny broadcast); executors never hash.
  * `dim` must equal the vector length (shorter vectors yield NULL like
  * the out-of-range access they would imply; the knob exists because
  * the planes are materialized, not inferred per row).
  *
  * Null-ELEMENT semantics match the unrolled
  * `CASE WHEN dot >= 0 THEN 1<<b ELSE 0 END` scalar form this replaces
  * (and the DuckDB oracle's identical CASE): a NULL element makes every
  * plane's dot NULL, `NULL >= 0` is NULL, so every bit falls to the
  * ELSE branch — bucket 0, NOT a NULL bucket (every plane spans all
  * `dim` components, so the per-plane rule collapses to a whole-bucket
  * rule). SimilaritySpec pins this with explicit null-element rows so a
  * swap between the forms can never silently change behavior.
  */
case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  @transient private lazy val mat: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket requires an array<double> argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = if (mat.length == 0) 0 else mat(0).length
    if (v.numElements() < dim) return null
    var bucket = 0L
    var b = 0
    while (b < mat.length) {
      val r = mat(b)
      var dot = 0.0
      var i = 0
      while (i < r.length) {
        if (v.isNullAt(i)) return 0L // NULL dot -> ELSE 0 on every plane
        dot += v.getDouble(i) * r(i)
        i += 1
      }
      if (dot >= 0.0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("planes", mat, "double[][]")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      val bucket = ctx.freshName("bucket")
      val nullElem = ctx.freshName("nullElem")
      s"""
         |if ($m.length > 0 && $v.numElements() < $m[0].length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bucket = 0L;
         |  boolean $nullElem = false;
         |  for (int $b = 0; $b < $m.length && !$nullElem; $b++) {
         |    final double[] $row = $m[$b];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $row.length; $i++) {
         |      if ($v.isNullAt($i)) { $nullElem = true; break; }
         |      $dot += $v.getDouble($i) * $row[$i];
         |    }
         |    if (!$nullElem && $dot >= 0.0) $bucket |= (1L << $b);
         |  }
         |  ${ev.value} = $nullElem ? 0L : $bucket;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {

  /** Plane components r_b[i] = (murmur3(seed, b, i) mod 2001 - 1000)/1000
    * for b in [planeOffset, planeOffset + bits). Composition mirrors
    * Spark's Murmur3Hash fold (seed 42, one hashInt per int argument) —
    * SimilaritySpec pins this against the in-engine `hash()` function so
    * the literal planes (also inlined into DuckDB oracle SQL) can never
    * silently desync from the construction's definition.
    */
  def planes(bits: Int, seed: Int, dim: Int, planeOffset: Int = 0): Seq[Seq[Double]] = {
    import org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt
    (planeOffset until planeOffset + bits).map { b =>
      val hb = hashInt(b, hashInt(seed, 42))
      IndexedSeq.tabulate(dim)(i => (Math.floorMod(hashInt(i, hb), 2001) - 1000) / 1000.0)
    }
  }

  /** SQL builder: `hyperplane_bucket(v, bits, seed, dim[, planeOffset])`
    * with integer-literal knobs (the planes must be constructible at
    * plan-build time).
    */
  private[functions] def fromExprs(exprs: Seq[Expression]): HyperplaneBucket = {
    require(exprs.size == 4 || exprs.size == 5,
      s"hyperplane_bucket expects (v, bits, seed, dim[, planeOffset]), got ${exprs.size} args")
    def intLit(e: Expression, what: String): Int = {
      require(e.foldable, s"hyperplane_bucket: $what must be a literal")
      e.eval(InternalRow.empty) match {
        case i: java.lang.Integer => i.intValue
        case l: java.lang.Long => l.intValue
        case other => throw new IllegalArgumentException(
          s"hyperplane_bucket: $what must be an integer literal, got $other")
      }
    }
    val bits = intLit(exprs(1), "bits")
    val seed = intLit(exprs(2), "seed")
    val dim = intLit(exprs(3), "dim")
    val off = if (exprs.size == 5) intLit(exprs(4), "planeOffset") else 0
    require(bits > 0 && bits <= 63, s"hyperplane_bucket: bits must be in [1, 63], got $bits")
    require(dim > 0, s"hyperplane_bucket: dim must be positive, got $dim")
    require(off >= 0, s"hyperplane_bucket: planeOffset must be >= 0, got $off")
    HyperplaneBucket(exprs.head, planes(bits, seed, dim, off))
  }
}
