package graft

import org.apache.spark.sql.functions._
import graft.ml.Pca

/** Whitening / PCA-apply laws on planted geometry: diagonal whitening
  * must invert exactly (whiten∘unwhiten ≈ identity up to the round-6
  * emit), whitened dims must have unit moments, and Pca.fit1 must
  * recover a planted dominant axis with its variance as λ₁ — the
  * contract embed_whiten / embed_pca_apply ship.
  */
class WhitenSpec extends SparkSpec {

  private val dim = 64

  /** planted corpus: μ + a·5·e(3) + b·0.5·e(7), a,b ∈ {−1,1} seeded. */
  private def planted: Seq[(Long, Seq[Double])] = {
    val rnd = new scala.util.Random(3)
    val mu = Array.tabulate(dim)(i => 0.1 * (i % 5))
    (0 until 200).map { k =>
      val a = if (rnd.nextBoolean()) 1.0 else -1.0
      val b = if (rnd.nextBoolean()) 1.0 else -1.0
      val v = mu.clone()
      v(3) += 5.0 * a
      v(7) += 0.5 * b
      (k.toLong, v.toSeq)
    }
  }

  private def vframe = {
    import spark.implicits._
    planted.toDF("vec_id", "v")
  }

  test("diagonal whiten inverts: z*sigma + mu recovers x within round-6") {
    val e = vframe.select(col("vec_id"), posexplode(col("v")).as(Seq("i0", "x")))
      .select(col("vec_id"), (col("i0") + 1).as("dim"), col("x"))
    val st = e.groupBy(col("dim"))
      .agg(round(avg(col("x")), 6).as("m"),
        round(avg(col("x") * col("x")) - avg(col("x")) * avg(col("x")), 6).as("va"))
    val z = e.join(broadcast(st), "dim")
      .select(col("vec_id"), col("dim"), col("x"), col("m"), col("va"),
        when(col("va") > 0, round((col("x") - col("m")) / sqrt(col("va")), 6))
          .otherwise(lit(0.0)).as("z"))
    val bad = z.where(col("va") > 0)
      .select(abs(col("z") * sqrt(col("va")) + col("m") - col("x")).as("err"))
      .agg(max(col("err"))).head().getDouble(0)
    assert(bad < 1e-4, s"max inversion error $bad")
    // dead dims (va = 0) map to exactly 0, never NaN
    val dead = z.where(col("va") === 0).agg(max(abs(col("z")))).head()
    assert(dead.isNullAt(0) || dead.getDouble(0) === 0.0)
  }

  test("whitened dims have unit moments (mean ~ 0, var ~ 1)") {
    val e = vframe.select(posexplode(col("v")).as(Seq("i0", "x")))
      .select((col("i0") + 1).as("dim"), col("x"))
    val st = e.groupBy(col("dim"))
      .agg(round(avg(col("x")), 6).as("m"),
        round(avg(col("x") * col("x")) - avg(col("x")) * avg(col("x")), 6).as("va"))
    val mom = e.join(broadcast(st), "dim").where(col("va") > 0)
      .select(((col("x") - col("m")) / sqrt(col("va"))).as("z"))
      .agg(avg(col("z")).as("mz"), (avg(col("z") * col("z")) - avg(col("z")) * avg(col("z"))).as("vz"))
      .head()
    assert(math.abs(mom.getDouble(0)) < 1e-5)
    assert(math.abs(mom.getDouble(1) - 1.0) < 1e-4)
  }

  test("Pca.fit1 recovers the planted dominant axis and its variance as lambda") {
    val p = Pca.fit1(vframe, dim, iters = 8)
    // dominant direction is e(3) (variance 25 vs 0.25 on e(7))
    assert(math.abs(p.w(3)) > 0.99, s"pc1 not on the planted axis: ${p.w.toSeq}")
    assert(math.abs(p.lam - 25.0) < 0.5, s"lambda ${p.lam} != planted 25")
    // centered projection whitened by sqrt(lambda) has unit variance
    val zw = planted.map { case (_, v) =>
      var t = 0.0
      var i = 0
      while (i < dim) { t += (v(i) - p.mu(i)) * p.w(i); i += 1 }
      t / math.sqrt(p.lam)
    }
    val mean = zw.sum / zw.size
    val vzw = zw.map(x => (x - mean) * (x - mean)).sum / zw.size
    assert(math.abs(vzw - 1.0) < 0.05, s"whitened variance $vzw")
  }

  test("Pca.fitM recovers BOTH planted axes in variance order (deflation law)") {
    val p = Pca.fitM(vframe, dim, iters = 8, m = 2)
    // component 1 = e(3) (var 25), component 2 = e(7) (var 0.25) —
    // deflation must remove the dominant axis so the residual's top
    // eigenvector is the second planted axis
    assert(math.abs(p.w(0)(3)) > 0.99, s"pc1 not on e(3): ${p.w(0).toSeq}")
    assert(math.abs(p.lam(0) - 25.0) < 0.5, s"lam1 ${p.lam(0)} != 25")
    assert(math.abs(p.w(1)(7)) > 0.99, s"pc2 not on e(7): ${p.w(1).toSeq}")
    assert(math.abs(p.lam(1) - 0.25) < 0.05, s"lam2 ${p.lam(1)} != 0.25")
    // extracted components are orthogonal
    val dot12 = (0 until dim).map(i => p.w(0)(i) * p.w(1)(i)).sum
    assert(math.abs(dot12) < 1e-3, s"components not orthogonal: $dot12")
  }

  test("full PCA whitening decorrelates: whitened coords have unit variance and ~0 covariance") {
    val p = Pca.fitM(vframe, dim, iters = 8, m = 2)
    val z = planted.map { case (_, v) =>
      val t = (0 until 2).map { c =>
        var acc = 0.0
        var i = 0
        while (i < dim) { acc += (v(i) - p.mu(i)) * p.w(c)(i); i += 1 }
        acc / math.sqrt(p.lam(c))
      }
      (t(0), t(1))
    }
    val n = z.size.toDouble
    val (m1, m2) = (z.map(_._1).sum / n, z.map(_._2).sum / n)
    val v1 = z.map(x => (x._1 - m1) * (x._1 - m1)).sum / n
    val v2 = z.map(x => (x._2 - m2) * (x._2 - m2)).sum / n
    val cov = z.map(x => (x._1 - m1) * (x._2 - m2)).sum / n
    assert(math.abs(v1 - 1.0) < 0.05, s"z1 variance $v1")
    assert(math.abs(v2 - 1.0) < 0.05, s"z2 variance $v2")
    assert(math.abs(cov) < 0.05, s"whitened covariance $cov not ~0")
  }
}
