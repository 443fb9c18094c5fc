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

  test("staircase absorption mode terminates via the partition-PAVA fallback (no throw)") {
    // ascending staircase with a trailing LOW pool: each run-collapse
    // round merges exactly ONE neighbor (the r12-advice non-convergence
    // mode — a new adjacent violation per merge). Guard forced under
    // the table and the round budget nearly exhausted, so fit MUST
    // terminate through the MLlib-shape partition-PAVA + driver-merge
    // fallback — and still equal sequential PAVA exactly.
    spark.conf.set("spark.graft.isotonic.localLimit", "1")
    try {
      import spark.implicits._
      val m = 30
      val n = Array.fill(m)(10L)
      val sy = Array.tabulate(m)(i => if (i == m - 1) 0L else i.toLong)
      val g = n.indices.map(i => (i.toDouble, n(i), sy(i))).toDF("score", "n", "sy")
      val got = graft.ops.Isotonic.fit(g, maxRounds = 4)
        .orderBy(org.apache.spark.sql.functions.col("score"))
        .collect().map(_.getDouble(3))
      val want = pava(n, sy)
      for (i <- 0 until m)
        assert(math.abs(got(i) - want(i)) < 1e-12,
          s"idx $i: ${got.toSeq} vs ${want.toSeq}")
      for (i <- 1 until m) assert(got(i) >= got(i - 1), "fallback fit not monotone")
    } finally spark.conf.unset("spark.graft.isotonic.localLimit")
  }

  test("ml_isotonic_predict: step function, carry across train-empty buckets, below-min clip") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("isopred").toString
    // scores = n_chars + doc_id/pw. Train (doc_id % 5 != 0) sparse
    // against 64 buckets => most buckets are train-empty, so test
    // points exercise the cross-bucket CARRY; doc_id 5 (n_chars 1)
    // sits below the min train score => the clip-to-first branch.
    // y: 0 for small scores, 1 for large => fit is a clean step.
    val rows = Seq(
      (1L, 10L, "fr"), (2L, 20L, "fr"), (3L, 900L, "en"), (4L, 990L, "en"),
      (5L, 1L, "en"),   // test, below all train scores -> first fitted value
      (10L, 15L, "fr"), (15L, 500L, "en"), (20L, 950L, "fr"), (25L, 999L, "en"))
    rows.map { case (id, nc, lang) => (id, nc, lang, s"doc$id") }
      .toDF("doc_id", "n_chars", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = graft.queries.MlQueries.mlIsotonicPredict.run(spark, tmp)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toList
    // driver reference: PAVA over train distinct scores, then the step
    val pw = 1L << java.lang.Long.toBinaryString(25L).length
    def score(id: Long, nc: Long) = nc.toDouble + id.toDouble / pw
    val train = rows.filter(_._1 % 5 != 0)
      .map { case (id, nc, lang) => (score(id, nc), if (lang == "en") 1L else 0L) }
      .sortBy(_._1)
    val fit = graft.ops.Isotonic.pavaLocal(train.map(t => (1L, t._2)).toArray)
    def predict(x: Double): Double = {
      val idx = train.indices.filter(i => train(i)._1 <= x)
      if (idx.isEmpty) fit(0) else fit(idx.max)
    }
    val want = rows.filter(_._1 % 5 == 0).map { case (id, nc, lang) =>
      (if (lang == "en") 1L else 0L,
        math.rint(predict(score(id, nc)) * 1e6) / 1e6)
    }.sortBy(t => t._2 -> t._1).toList
    assert(got.map(_._2).sorted === want.map(_._2).sorted,
      s"got $got want $want")
    // the below-min clip really hit the FIRST fitted value
    val gotRow5 = graft.queries.MlQueries.mlIsotonicPredict.run(spark, tmp)
      .orderBy(col("score")).collect().head
    assert(gotRow5.getDouble(2) === math.rint(fit(0) * 1e6) / 1e6)
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
