package graft

import graft.ops.Components

class ComponentsSpec extends SparkSpec {

  test("chains, triangles, and singletons-by-pair resolve to min labels") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("i", "j")
    val got = Components.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("long chain (diameter > 5) still converges to the min label") {
    import spark.implicits._
    val chain = (0 until 9).map(k => (100L + k, 101L + k)).toDF("i", "j")
    val got = Components.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(100L))
    assert(got.size === 10)
  }

  test("pointer jumping: 64-node chain converges in O(log d) rounds, not O(d)") {
    import spark.implicits._
    val chain = (0 until 63).map(k => (1000L + k, 1001L + k)).toDF("i", "j")
    val got = Components.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet === Set(1000L))
    assert(got.size === 64)
    // plain 2-hop propagation would need ~32 rounds + 1 to detect the
    // fixpoint; (hop+jump)x2 contracts geometrically
    assert(Components.lastRounds <= 6,
      s"expected <=6 rounds, took ${Components.lastRounds}")
  }

  test("random graphs match a union-find reference (12 seeded cases)") {
    import spark.implicits._
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(40)
      val pairs = (0 until rnd.nextInt(60))
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      if (pairs.nonEmpty) {
        val parent = Array.tabulate(n)(identity)
        def find(x: Int): Int =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        pairs.foreach { case (a, b) =>
          val (ra, rb) = (find(a.toInt), find(b.toInt))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = pairs.flatMap(p => Seq(p._1, p._2)).distinct
          .groupBy(x => find(x.toInt))
          .values.flatMap { s => val mn = s.min; s.map(_ -> mn) }.toMap
        val got = Components.connectedComponents(pairs.toDF("i", "j"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === want, s"seed=$seed pairs=$pairs")
      }
    }
  }

  test("empty pair set yields an empty labeling, not an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("i", "j")
    assert(Components.connectedComponents(empty).count() === 0L)
  }

  test("reliable checkpoint dir variant produces identical labels") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ccckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("i", "j")
    val got = Components.connectedComponents(pairs, checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
    // reliable checkpoints actually hit the directory
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("mergeBatch == full CC: bridges, new chains, self-component edges, random splits") {
    import spark.implicits._
    def cc(edges: Seq[(Long, Long)]) =
      Components.connectedComponents(edges.toDF("i", "j"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def merged(prior: Seq[(Long, Long)], batch: Seq[(Long, Long)]) = {
      val pc = Components.connectedComponents(prior.toDF("i", "j"))
        .select("node", "rep")
      Components.mergeBatch(pc, batch.toDF("i", "j"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // planted: prior has components {1,2,3} and {10,11}; the batch
    // BRIDGES them (3-10, via a new node 50), adds a brand-new pair
    // {70,71}, an edge inside an existing component (2-3, no-op), and
    // chains a new node onto {10,11} — note batch ids are NOT all
    // larger than prior ids (min-rep needs no id monotonicity)
    val prior = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val batch = Seq((3L, 50L), (50L, 10L), (70L, 71L), (2L, 3L), (11L, 5L))
    assert(merged(prior, batch) === cc(prior ++ batch))
    // random splits: 8 seeded graphs, arbitrary prior/batch partition
    val rnd = new scala.util.Random(9)
    for (trial <- 1 to 8) {
      val n = 6 + rnd.nextInt(30)
      val all = (0 until (n + rnd.nextInt(n))).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      if (all.nonEmpty) {
        val (batchE, priorE) = all.partition(_ => rnd.nextBoolean())
        if (batchE.nonEmpty)
          assert(merged(priorE, batchE) === cc(all),
            s"trial $trial diverged (prior=${priorE.size} batch=${batchE.size})")
      }
    }
  }
}
