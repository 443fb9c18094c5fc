package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomSketch, KMVDistinct}

/** Properties of the Bloom TypedImperativeAggregate: the bitset is a
  * pure function of the input set (partitioning/order independent and
  * a bit-exact match of a hand-built mirror), membership probes via
  * mightContainSql have NO false negatives, false positives are the
  * deterministic strided-window collisions the mirror predicts, and
  * the knob validation rejects bad geometries.
  */
class BloomSketchSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, m: Int, k: Int): Seq[Long] = {
    BloomSketch.register(spark)
    df.agg(expr(s"bloom_sketch(hv, $m, $k)")).head().getSeq[Long](0)
  }

  private def mirrorBits(hashes: Seq[Long], m: Int, k: Int): Array[Long] = {
    val bits = new Array[Long](m / 64)
    for (h0 <- hashes; j <- 0 until k) {
      val h = h0 & KMVDistinct.HashMask
      val pos = ((h >>> (12 * j)) & (m - 1)).toInt
      bits(pos >>> 6) |= 1L << (pos & 63)
    }
    bits
  }

  private def mirrorContains(bits: Array[Long], h0: Long, m: Int, k: Int): Boolean = {
    val h = h0 & KMVDistinct.HashMask
    (0 until k).forall { j =>
      val pos = ((h >>> (12 * j)) & (m - 1)).toInt
      ((bits(pos >>> 6) >>> (pos & 63)) & 1L) == 1L
    }
  }

  test("bitset is partitioning- and order-independent and matches the strided-window mirror") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val hashes = (1 to 3000).map(_ => rnd.nextLong())
    val (m, k) = (4096, 4)
    val a = sketch(hashes.toDF("hv").repartition(1), m, k)
    val b = sketch(hashes.toDF("hv").repartition(32), m, k)
    val c = sketch(scala.util.Random.shuffle(hashes).toDF("hv").repartition(5), m, k)
    assert(a == b && b == c)
    assert(a == mirrorBits(hashes, m, k).toSeq)
  }

  test("no false negatives ever; false positives match the mirror exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val inserted = (1 to 1000).map(_ => rnd.nextLong())
    val absent = (1 to 1000).map(_ => rnd.nextLong()).filterNot(inserted.toSet)
    val (m, k) = (4096, 4)
    val bits = mirrorBits(inserted, m, k)
    val bloom = inserted.toDF("hv").agg(expr(s"bloom_sketch(hv, $m, $k)").as("bf"))
    val probed = (inserted ++ absent).toDF("hv")
      .crossJoin(broadcast(bloom))
      .withColumn("pass", expr(BloomSketch.mightContainSql("bf", "hv", m, k)))
      .select(col("hv"), col("pass")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    inserted.foreach(h => assert(probed(h), s"false negative for inserted $h"))
    val fp = absent.count(probed)
    val fpMirror = absent.count(h => mirrorContains(bits, h, m, k))
    assert(fp == fpMirror, s"spark fp $fp != mirror fp $fpMirror")
    // fill ~ 1-exp(-4*1000/4096) = 0.62 => fp rate ~ 15%; generous band
    assert(fp > 0 && fp < absent.size / 2, s"implausible fp count $fp / ${absent.size}")
  }

  test("rejects a non-power-of-two mBits and an over-60-bit probe stride") {
    import spark.implicits._
    BloomSketch.register(spark)
    val df = Seq(1L).toDF("hv")
    val e1 = intercept[Exception](df.agg(expr("bloom_sketch(hv, 1000, 4)")).head())
    assert(e1.getMessage.contains("power of two"))
    val e2 = intercept[Exception](df.agg(expr("bloom_sketch(hv, 4096, 6)")).head())
    assert(e2.getMessage.contains("60-bit"))
  }

  test("prune query: pass bounds match truth, false passes are the pass/match gap") {
    val df = graft.queries.RelationalQueries.qBloomPrune.run(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, pass, m, fp) = (r.getAs[Long]("n_cust"), r.getAs[Long]("n_pass"),
        r.getAs[Long]("n_match"), r.getAs[Long]("n_false_pass"))
      assert(pass >= m, s"${r.getString(0)}: a truly-matching customer failed the filter")
      assert(fp == pass - m, s"${r.getString(0)}: false-pass arithmetic broken")
      assert(pass <= n)
    }
  }
}
