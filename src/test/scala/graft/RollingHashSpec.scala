package graft

import org.apache.spark.sql.functions._
import graft.functions.RollingHash

class RollingHashSpec extends SparkSpec {

  test("known values, interpreted eval") {
    val e = new RollingHash(org.apache.spark.sql.catalyst.expressions.Literal("ab"))
    // (0*257 + 97) % M = 97; (97*257 + 98) % M = 25027
    assert(e.eval(null) === 25027L)
    val empty = new RollingHash(org.apache.spark.sql.catalyst.expressions.Literal(""))
    assert(empty.eval(null) === 0L)
  }

  test("codegen path through a query matches interpreted eval") {
    import spark.implicits._
    RollingHash.register(spark)
    val got = Seq("ab", "", "hello world").toDF("s")
      .select(expr("rolling_hash(s)")).collect().map(_.getLong(0))
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * 257 + (b & 0xff)) % 1000000007L)
    assert(got.toSeq === Seq(ref("ab"), 0L, ref("hello world")))
    assert(got(0) === 25027L)
  }
}
