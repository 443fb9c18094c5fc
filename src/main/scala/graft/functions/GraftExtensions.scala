package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration for the engine's native functions:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions` makes
  * `rolling_hash` and `kmv_distinct` available in pure SQL sessions
  * (spark-sql, JDBC) with no Scala entry point. In-process users can
  * call `RollingHash.register(spark)` / `KMVDistinct.register(spark)`
  * instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("portable_hash64"),
      new ExpressionInfo(classOf[PortableHash64].getName, "portable_hash64"),
      (exprs: Seq[Expression]) => PortableHash64.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[KMVDistinct].getName, "kmv_distinct"),
      (exprs: Seq[Expression]) => KMVDistinct.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_bucket"),
      new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket"),
      (exprs: Seq[Expression]) => HyperplaneBucket.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("hll_distinct"),
      new ExpressionInfo(classOf[HLLDistinct].getName, "hll_distinct"),
      (exprs: Seq[Expression]) => HLLDistinct.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CMSketch].getName, "cms_sketch"),
      (exprs: Seq[Expression]) => CMSketch.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("bloom_sketch"),
      new ExpressionInfo(classOf[BloomSketch].getName, "bloom_sketch"),
      (exprs: Seq[Expression]) => BloomSketch.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("sample_quantiles"),
      new ExpressionInfo(classOf[QuantileSketch].getName, "sample_quantiles"),
      (exprs: Seq[Expression]) => QuantileSketch.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("simhash32"),
      new ExpressionInfo(classOf[SimHash32].getName, "simhash32"),
      (exprs: Seq[Expression]) => SimHash32.fromExprs(exprs)))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSig.fromExprs(exprs)))
  }
}
