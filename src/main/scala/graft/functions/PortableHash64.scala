package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's portable 60-bit hash:
  * `conv(substr(md5(concat(salt, ':', value)), 1, 15), 16, 10)` — the
  * first 15 hex nibbles of md5("salt:value") as a long — WITHOUT the
  * hex-string round trip: one digest per call, the value read straight
  * from the first 8 digest bytes ((b0..b6 << 4) | b7 >>> 4). Bit-exact
  * with the SQL formula (TextOpsSpec proves it), so DuckDB oracles are
  * unchanged while the dedup/sketch pipelines skip a 32-char hex
  * allocation + base-16 parse per shingle.
  *
  * The MessageDigest instance lives in codegen mutable state — one per
  * operator instance, reset per call, no per-row allocation.
  */
case class PortableHash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"portable_hash64 requires (string salt, string value), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash64"

  // per-THREAD digest, not per-instance: one expression instance can be
  // evaluated concurrently (driver-side constant folding / local-relation
  // eval vs. executor task threads share the instance through the plan),
  // and MessageDigest is stateful — interleaved updates corrupt silently
  @transient private lazy val md0 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  override def nullSafeEval(salt: Any, value: Any): Any = {
    val md = md0.get()
    md.reset()
    md.update(salt.asInstanceOf[UTF8String].getBytes)
    md.update(':'.toByte)
    md.update(value.asInstanceOf[UTF8String].getBytes)
    PortableHash64.first60Bits(md.digest())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mdRef = ctx.addMutableState("java.security.MessageDigest", "md",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }"""
        .stripMargin)
    nullSafeCodeGen(ctx, ev, (salt, value) => {
      val d = ctx.freshName("digest")
      s"""
         |$mdRef.reset();
         |$mdRef.update($salt.getBytes());
         |$mdRef.update((byte) ':');
         |$mdRef.update($value.getBytes());
         |byte[] $d = $mdRef.digest();
         |${ev.value} = graft.functions.PortableHash64.first60Bits($d);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PortableHash64 =
    copy(left = newLeft, right = newRight)
}

object PortableHash64 {
  /** First 15 hex nibbles of the digest as a long: 7 full bytes plus the
    * high nibble of the 8th.
    */
  def first60Bits(digest: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    (acc << 4) | ((digest(7) & 0xf0L) >>> 4)
  }

  /** SQL builder shared by register() and GraftExtensions. */
  private[functions] def fromExprs(exprs: Seq[Expression]): PortableHash64 = {
    require(exprs.size == 2, "portable_hash64 expects (salt, value)")
    PortableHash64(exprs(0), exprs(1))
  }

  /** Idempotent SQL registration: `portable_hash64(salt, value)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "portable_hash64", fromExprs, "built-in")
}
