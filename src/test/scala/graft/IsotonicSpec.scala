package graft

/** The identity ml_isotonic_calibration relies on: the minimax formula
  * iso(i) = max_{j≤i} min_{k≥i} mean(y over bins j..k) equals the
  * pool-adjacent-violators fit (Ayer et al. 1955) — weighted, on
  * random bin tables — and the result is monotone nondecreasing.
  * Pure-Scala differential (the query is the same arithmetic over
  * 10-row frames; the law is what needs pinning).
  */
class IsotonicSpec extends SparkSpec {

  /** weighted PAVA reference: pools adjacent violators until monotone. */
  private def pava(n: Array[Long], sy: Array[Long]): Array[Double] = {
    case class Block(var w: Long, var s: Long)
    val blocks = scala.collection.mutable.ArrayBuffer[Block]()
    val sizes = scala.collection.mutable.ArrayBuffer[Int]()
    for (i <- n.indices) {
      blocks += Block(n(i), sy(i)); sizes += 1
      while (blocks.size > 1 && {
        val a = blocks(blocks.size - 2); val b = blocks.last
        a.s.toDouble / a.w > b.s.toDouble / b.w
      }) {
        val b = blocks.remove(blocks.size - 1)
        val sz = sizes.remove(sizes.size - 1)
        blocks.last.w += b.w; blocks.last.s += b.s
        sizes(sizes.size - 1) += sz
      }
    }
    blocks.iterator.zip(sizes.iterator)
      .flatMap { case (b, sz) => Iterator.fill(sz)(b.s.toDouble / b.w) }.toArray
  }

  private def minimax(n: Array[Long], sy: Array[Long]): Array[Double] = {
    val m = n.length
    val cn = n.scanLeft(0L)(_ + _)
    val cp = sy.scanLeft(0L)(_ + _)
    def mean(j: Int, k: Int): Double = (cp(k + 1) - cp(j)).toDouble / (cn(k + 1) - cn(j))
    Array.tabulate(m) { i =>
      (0 to i).map(j => (i until m).map(k => mean(j, k)).min).max
    }
  }

  test("minimax identity == weighted PAVA on random bin tables; result monotone") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 50) {
      val m = 2 + rnd.nextInt(10)
      val n = Array.fill(m)(1L + rnd.nextInt(50))
      val sy = n.map(w => rnd.nextInt(w.toInt + 1).toLong)
      val a = minimax(n, sy)
      val b = pava(n, sy)
      for (i <- 0 until m) {
        assert(math.abs(a(i) - b(i)) < 1e-9, s"trial $trial bin $i: ${a.toSeq} vs ${b.toSeq}")
        if (i > 0) assert(a(i) >= a(i - 1) - 1e-12, s"trial $trial not monotone: ${a.toSeq}")
      }
    }
  }

  test("already-monotone rates are a fixpoint; a flat violator pools to the weighted mean") {
    val fix = minimax(Array(10L, 10L, 10L), Array(1L, 5L, 9L))
    assert(fix.toSeq === Seq(0.1, 0.5, 0.9))
    // bins (rate .8 then .2) with equal weight pool to .5
    val pooled = minimax(Array(10L, 10L), Array(8L, 2L))
    assert(pooled.toSeq === Seq(0.5, 0.5))
  }

  private def fitDistributed(n: Array[Long], sy: Array[Long]): Array[Double] = {
    import spark.implicits._
    val g = n.indices.map(i => (i.toDouble, n(i), sy(i))).toDF("score", "n", "sy")
    graft.ops.Isotonic.fit(g).orderBy(org.apache.spark.sql.functions.col("score"))
      .collect().map(_.getDouble(3))
  }

  test("hybrid fit (guarded driver finish) == sequential PAVA on random weighted tables") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 5) {
      val m = 20 + rnd.nextInt(60)
      val n = Array.fill(m)(1L + rnd.nextInt(50))
      val sy = n.map(w => rnd.nextInt(w.toInt + 1).toLong)
      val got = fitDistributed(n, sy)
      val want = pava(n, sy)
      for (i <- 0 until m)
        assert(math.abs(got(i) - want(i)) < 1e-12,
          s"trial $trial idx $i: ${got.toSeq} vs ${want.toSeq}")
    }
  }

  test("DISTRIBUTED run-collapse rounds (guard forced to 1) == sequential PAVA") {
    // localLimit = 1 keeps every round on the distributed path until
    // the no-violations exit — pins the beyond-guard loop itself
    spark.conf.set("spark.graft.isotonic.localLimit", "1")
    try {
      val rnd = new scala.util.Random(29)
      for (trial <- 1 to 2) {
        val m = 20 + rnd.nextInt(30)
        val n = Array.fill(m)(1L + rnd.nextInt(50))
        val sy = n.map(w => rnd.nextInt(w.toInt + 1).toLong)
        val got = fitDistributed(n, sy)
        val want = pava(n, sy)
        for (i <- 0 until m)
          assert(math.abs(got(i) - want(i)) < 1e-12,
            s"trial $trial idx $i: ${got.toSeq} vs ${want.toSeq}")
      }
    } finally spark.conf.unset("spark.graft.isotonic.localLimit")
  }

  test("distributed PAVA pathological shapes: strictly decreasing collapses to one pool; " +
      "sawtooth and already-isotonic are handled") {
    // strictly decreasing rates: everything pools to the global mean
    val dec = fitDistributed(Array(10L, 10L, 10L, 10L), Array(9L, 6L, 3L, 0L))
    assert(dec.toSeq === Seq(0.45, 0.45, 0.45, 0.45))
    // already isotonic: fixpoint, untouched
    val iso = fitDistributed(Array(5L, 5L, 5L), Array(0L, 2L, 5L))
    assert(iso.toSeq === Seq(0.0, 0.4, 1.0))
    // sawtooth (0.8, 0.2, 0.8, 0.2): needs a SECOND round — the first
    // collapse creates new adjacent violations
    val saw = fitDistributed(Array(10L, 10L, 10L, 10L), Array(8L, 2L, 8L, 2L))
    val want = pava(Array(10L, 10L, 10L, 10L), Array(8L, 2L, 8L, 2L))
    assert(saw.toSeq === want.toSeq)
  }
}
