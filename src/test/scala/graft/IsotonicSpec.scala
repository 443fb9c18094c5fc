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
}
