package graft

import org.apache.spark.sql.functions._

/** Invariants of the iterative/link-analysis queries that the oracle's
  * hash compare can't articulate: rank-mass conservation, structural
  * ordering, and the mixture math (queries/GraphQueries.scala,
  * MlQueries.mlMixtureTemperature).
  */
class GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("pagerank: rank mass is conserved and every vertex holds positive rank") {
    val rows = graft.queries.GraphQueries.graphPagerank.run(spark, dir)
      .select(col("pr_rel")).collect().map(_.getDouble(0))
    assert(rows.nonEmpty)
    assert(rows.forall(_ > 0.0), "a vertex lost all rank mass")
    // Σ rank = 1, so Σ pr_rel = Σ rank·V = V (up to the round-6 emit)
    assert(math.abs(rows.sum - rows.length) < 1e-3 * rows.length,
      s"rank mass not conserved: sum=${rows.sum} over ${rows.length} vertices")
  }

  test("pagerank: high-degree suppliers out-rank customers on the bipartite graph") {
    val df = graft.queries.GraphQueries.graphPagerank.run(spark, dir)
    val byKind = df.groupBy(col("kind")).agg(avg(col("pr_rel")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // far fewer suppliers than customers share the same total edge mass,
    // so the average supplier is structurally more central
    assert(byKind("s") > byKind("c"),
      s"supplier avg ${byKind("s")} not above customer avg ${byKind("c")}")
  }

  private def census(edges: (Int, Int)*): (Long, Long, Long, Double) = {
    import spark.implicits._
    val e = edges.map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }
      .distinct.toDF("x", "y")
    val r = graft.queries.GraphQueries.triangleCensus(e).collect().head
    (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_triangles"), r.getAs[Double]("global_cc"))
  }

  test("triangles: K4 has 4, a path has 0, cc follows 3T/wedges") {
    // K4: 4 nodes, 6 edges, C(4,3)=4 triangles, every wedge closed -> cc 1
    val k4 = census((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(k4 == ((4L, 6L, 4L, 1.0)), s"K4 census was $k4")
    // path 1-2-3-4: 2 open wedges, no triangles
    val path = census((1, 2), (2, 3), (3, 4))
    assert(path == ((4L, 3L, 0L, 0.0)), s"path census was $path")
  }

  test("triangles: planted triangle + pendant; hub skew does not multi-count") {
    // triangle {1,2,3} with a pendant 4 off node 1: degrees 3,2,2,1 ->
    // wedges C(3,2)+C(2,2)+C(2,2) = 5, cc = 3/5
    val t = census((1, 2), (2, 3), (1, 3), (1, 4))
    assert(t._3 == 1L, s"expected 1 triangle, got ${t._3}")
    assert(t._4 == 0.6, s"cc was ${t._4}")
    // star hub + one closing rim edge: exactly one triangle even though
    // the hub sits on every wedge (orientation counts it once)
    val star = census((0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2))
    assert(star._3 == 1L, s"star+rim expected 1 triangle, got ${star._3}")
  }

  test("triangles: matches brute force on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 14
    val edges = (for {
      a <- 0 until n; b <- (a + 1) until n if rnd.nextDouble() < 0.35
    } yield (a, b)).toSeq
    val brute = (for {
      a <- 0 until n; b <- (a + 1) until n; c <- (b + 1) until n
      if edges.contains((a, b)) && edges.contains((b, c)) && edges.contains((a, c))
    } yield 1).size
    val got = census(edges: _*)
    assert(got._3 == brute.toLong, s"expected $brute triangles, got ${got._3}")
  }

  test("label propagation: two triangles over a bridge resolve to two communities") {
    import spark.implicits._
    // triangle {0,1,2} — bridge 2-3 — triangle {3,4,5}; after 3 sync
    // rounds (self-vote, min-label ties) each triangle holds one label
    val und = Seq((0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5))
      .flatMap { case (a, b) => Seq((a.toLong, b.toLong), (b.toLong, a.toLong)) }
      .toDF("src", "dst")
    val labels = graft.queries.GraphQueries.labelPropagation(und, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size == 6)
    assert(Set(labels(0), labels(1), labels(2)).size == 1, s"left triangle split: $labels")
    assert(Set(labels(3), labels(4), labels(5)).size == 1, s"right triangle split: $labels")
    assert(labels(0) != labels(3), s"bridge merged the communities: $labels")
  }

  private def sym(edges: (Int, Int)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    edges.flatMap { case (a, b) => Seq((a.toLong, b.toLong), (b.toLong, a.toLong)) }
      .distinct.toDF("a", "b")
  }

  test("kcore: pendant chain cascades off K4; the peel needs its full round budget") {
    // K4 {0,1,2,3} with a pendant chain 3-4-5-6-7: at k=2 each round
    // peels exactly ONE chain node (7, then 6, ...) — the cascade that
    // proves a one-shot degree filter is not a k-core
    val g = sym((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
      (3, 4), (4, 5), (5, 6), (6, 7))
    val core = graft.queries.GraphQueries.kcorePeel(g, 2, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet == Set(0L, 1L, 2L, 3L), s"2-core was ${core.keySet}")
    assert(core.values.forall(_ == 3L), s"K4 core degrees: $core")
    // an insufficient round budget leaves chain remnants (proves the
    // fixed bound must cover the peel depth — 4 rounds needed here)
    val shallow = graft.queries.GraphQueries.kcorePeel(g, 2, 2)
      .collect().map(_.getLong(0)).toSet
    assert(shallow == Set(0L, 1L, 2L, 3L, 4L, 5L), s"2-round peel was $shallow")
    // k above the max clique degree empties the graph
    assert(graft.queries.GraphQueries.kcorePeel(g, 4, 8).count() == 0L)
  }

  test("bfs: hop counts on a chain with a branch; unreached stays absent") {
    import spark.implicits._
    // chain 0-1-2-3-4 with branch 2-9; island {20,21}
    val g = sym((0, 1), (1, 2), (2, 3), (3, 4), (2, 9), (20, 21))
    val seeds = Seq(0L).toDF("node")
    val d = graft.queries.GraphQueries.bfsLevels(g, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 9L -> 3L),
      s"bfs levels were $d")
    // multi-source: nearest seed wins; islands reachable from their own seed
    val d2 = graft.queries.GraphQueries.bfsLevels(g, Seq(4L, 20L).toDF("node"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2(20L) == 0L && d2(21L) == 1L && d2(2L) == 2L && d2(3L) == 1L, s"$d2")
  }

  test("sssp: a cheaper two-hop detour beats the direct edge; bounded rounds truncate honestly") {
    import spark.implicits._
    // directed weighted edges: 1→3 direct costs 10, but 1→2→3 costs 6;
    // 3→4 extends the detour to a 3-hop path that needs a third round
    val e = Seq((1L, 3L, 10L), (1L, 2L, 5L), (2L, 3L, 1L), (3L, 4L, 2L))
      .toDF("a", "b", "w")
    val seeds = Seq(1L).toDF("node")
    val d2 = graft.queries.GraphQueries.ssspRounds(e, seeds, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d2 == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 12L), s"sssp(2) was $d2")
    // one round only: the detour hasn't relaxed yet — the direct edge wins
    val d1 = graft.queries.GraphQueries.ssspRounds(e, seeds, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d1 == Map(1L -> 0L, 2L -> 5L, 3L -> 10L), s"sssp(1) was $d1")
    // third round: the improvement at 3 propagates through to 4
    val d3 = graft.queries.GraphQueries.ssspRounds(e, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d3 == Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 8L), s"sssp(3) was $d3")
  }

  test("closeness: per-seed distance tables stay independent; horizon truncates honestly") {
    import spark.implicits._
    // chain 0-1-2-3-4 plus island {20,21}: seed 0 must NOT inherit seed
    // 20's island rows (per-seed keying), and with a 4-round horizon
    // seed 0 reaches {1,2,3,4} at dists 1..4
    val g = sym((0, 1), (1, 2), (2, 3), (3, 4), (20, 21))
    val v = graft.queries.GraphQueries.closenessBfs(g, Seq(0L, 20L).toDF("node"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(v == Map(
      (0L, 0L) -> 0L, (0L, 1L) -> 1L, (0L, 2L) -> 2L, (0L, 3L) -> 3L, (0L, 4L) -> 4L,
      (20L, 20L) -> 0L, (20L, 21L) -> 1L), s"distance tables were $v")
    // truncated horizon: 2 rounds stop at dist 2 — closeness is over
    // the REACHED set only (the sampled-closeness contract)
    val t = graft.queries.GraphQueries.closenessBfs(g, Seq(0L).toDF("node"), 2)
      .agg(count(lit(1)), sum(col("dist"))).collect()(0)
    assert(t.getLong(0) == 3L && t.getLong(1) == 3L, s"truncated table: $t")
  }

  test("kcore/bfs match in-memory references on seeded random graphs") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 30
      val edges = (for {
        a <- 0 until n; b <- (a + 1) until n if rng.nextDouble() < 0.12
      } yield (a, b)).toList
      // reference k-core: literal peel-to-fixpoint over an adjacency map
      val k = 3
      var adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var changed = true
      while (changed) {
        val dead = adj.collect { case (v, ns) if ns.size < k => v }.toSet
        changed = dead.nonEmpty
        adj = (adj -- dead).view.mapValues(_ -- dead).toMap.filter(_._2.nonEmpty)
      }
      val wantCore = adj.map { case (v, ns) => v.toLong -> ns.size.toLong }
      val g = sym(edges: _*)
      val gotCore = graft.queries.GraphQueries.kcorePeel(g, k, 15)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotCore == wantCore, s"kcore mismatch on $edges")
      // reference BFS: queue from seeds {0, 1}, hop cap 3
      val full = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val wantDist = scala.collection.mutable.Map(0L -> 0L, 1L -> 0L)
      var frontier = Set(0, 1)
      for (d <- 1 to 3) {
        frontier = frontier.flatMap(v => full.getOrElse(v, Nil))
          .filterNot(v => wantDist.contains(v.toLong))
        frontier.foreach(v => wantDist(v.toLong) = d.toLong)
      }
      val gotDist = graft.queries.GraphQueries.bfsLevels(g, Seq(0L, 1L).toDF("node"), 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotDist == wantDist.toMap, s"bfs mismatch on $edges")
    }
  }

  test("supplier jaccard: ranked head is contiguous, monotone, and degree-consistent") {
    val rows = graft.queries.GraphQueries.graphJaccard.run(spark, dir).collect()
    assert(rows.nonEmpty)
    // contiguous rank 1..n in emit order
    assert(rows.map(_.getAs[Long]("rnk")).toSeq === (1L to rows.length).toSeq)
    // scores weakly decrease along the ranking and live in (0, 1]
    val js = rows.map(_.getAs[Double]("jaccard"))
    assert(js.forall(j => j > 0.0 && j <= 1.0))
    assert(js.zip(js.tail).forall { case (a, b) => a >= b }, "jaccard not sorted")
    // every row's score reconstructs from independently recomputed degrees
    val e = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(graft.core.Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk")).distinct()
    val deg = e.groupBy("sk").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b, common) = (r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b"),
        r.getAs[Long]("common"))
      val expect = BigDecimal(common.toDouble / (deg(a) + deg(b) - common))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("jaccard") === expect, s"row $r")
      assert(common >= 2 && a < b)
    }
  }

  test("mixture temperature: shares form a distribution and keep_p flattens the skew") {
    val rows = graft.queries.MlQueries.mlMixtureTemperature.run(spark, dir).collect()
    val share = rows.map(_.getAs[Double]("share"))
    assert(math.abs(share.sum - 1.0) < 1e-4, s"shares sum to ${share.sum}")
    rows.foreach { r =>
      val (n, keepP, kept) = (r.getAs[Long]("n_docs"),
        r.getAs[Double]("keep_p"), r.getAs[Long]("n_kept"))
      assert(keepP > 0.0 && keepP <= 1.0)
      assert(kept <= n)
    }
    // α = 0.5 < 1 means keep probability is non-increasing in corpus size
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
      .map(_.getAs[Double]("keep_p"))
    assert(byN.zip(byN.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"keep_p not non-increasing in n_docs: ${byN.mkString(",")}")
  }

  test("ppr matches an in-memory power-iteration mirror on a path + branch graph") {
    import spark.implicits._
    // 1-2-3-4-5 chain with a 3-6 branch, seed {1}: the mirror runs the
    // IDENTICAL recurrence (r' = 0.85·flow + 0.15·s) in plain Scala.
    // NOTE ppr is NOT monotone in hop distance — a degree-1 seed
    // forwards its whole mass, so its neighbor out-ranks it; the
    // differential is the honest check, not a decay assertion.
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 6L))
    val und = raw.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val undDf = und.toDF("src", "dst")
    val deg = undDf.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val edges = undDf.join(deg, Seq("src"))
    val seeds = Seq(1L).toDF("node")
    val got = graft.queries.GraphQueries.ppr(edges, seeds, 1L, 6, 0.85)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val outdeg = und.groupBy(_._1).map { case (k, v) => k -> v.size }
    var pr = Map(1L -> 1.0)
    for (_ <- 1 to 6) {
      val flow = und.flatMap { case (s, d) =>
        pr.get(s).map(p => d -> 0.85 * p / outdeg(s))
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      pr = (flow.keySet + 1L).map(n =>
        n -> (flow.getOrElse(n, 0.0) + (if (n == 1L) 0.15 else 0.0))).toMap
    }
    assert(got.keySet === pr.keySet)
    got.foreach { case (n, v) =>
      assert(math.abs(v - pr(n)) < 1e-12, s"node $n: got $v, mirror ${pr(n)}")
    }
    // no dangling nodes -> Σ pr = 1 every round
    assert(math.abs(got.values.sum - 1.0) < 1e-9, s"mass leaked: ${got.values.sum}")
  }

  test("graph_modularity equals a Scala mirror over the LP labels; blocks beat the null model") {
    import spark.implicits._
    // two dense bipartite blocks (custs 1,2 × supps 1,2 and custs 3,4 ×
    // supps 3,4) + one bridge (2,3); every edge repeated 3× to clear
    // the strong-graph support. The mirror recomputes Q_c from the
    // label_prop output and the raw edge list.
    val edges = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 3), (3, 4), (4, 3), (4, 4), (2, 3))
    val tmp = java.nio.file.Files.createTempDirectory("modul").toString
    (1 to 4).map(c => ((100 + c).toLong, c.toLong)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    edges.flatMap { case (c, s) => Seq.fill(3)(((100 + c).toLong, s.toLong)) }
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

    val labels = graft.queries.GraphQueries.graphLabelProp.run(spark, tmp)
      .collect().map(r => ((if (r.getString(0) == "c") r.getLong(1) * 2 else r.getLong(1) * 2 + 1),
        r.getLong(2))).toMap
    val nodePairs = edges.map { case (c, s) => (c * 2L, s * 2L + 1) }
    val m = nodePairs.size.toDouble
    val deg = nodePairs.flatMap { case (a, b) => Seq(a, b) }.groupBy(identity).map { case (k, v) => k -> v.size }
    val expected = labels.values.toSeq.distinct.sorted.map { lab =>
      val members = labels.filter(_._2 == lab).keySet
      val lc = nodePairs.count { case (a, b) => members(a) && members(b) }
      val dc = members.toSeq.map(deg).sum
      val q = BigDecimal(lc / m - (dc / (2.0 * m)) * (dc / (2.0 * m)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lab, members.size.toLong, lc.toLong, dc.toLong, q)
    }
    val got = graft.queries.GraphQueries.graphModularity.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === expected)
    // the partition beats the configuration-model null overall (LP
    // floods the smallest label across the bridge, so the planted
    // 2-block split is NOT what it finds — Q stays positive anyway;
    // the exact mirror above is the real check)
    assert(got.map(_._5).sum > 0.0, s"global modularity not positive: $got")
  }

  test("graph_random_walk matches an md5-argmin mirror on a planted graph") {
    import spark.implicits._
    // customers 1..3 x suppliers 1..4, partial bipartite adjacency; the
    // mirror recomputes every hop with the same hash64 argmin (min h,
    // then min dst) from the raw adjacency
    val ol = Seq((10L, 1L), (11L, 2L), (12L, 3L))           // order -> cust
    val li = Seq((10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L), (12L, 3L), (12L, 4L))
    val tmp = java.nio.file.Files.createTempDirectory("walk").toString
    ol.toDF("o_orderkey", "o_custkey").write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    li.toDF("l_orderkey", "l_suppkey").write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val got = graft.queries.GraphQueries.graphRandomWalk.run(spark, tmp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    def h64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val edges = ol.flatMap { case (ok, ck) =>
      li.filter(_._1 == ok).map(l => (ck * 2, l._2 * 2 + 1))
    }.distinct.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val expectedRows = adj.keys.filter(n => n % 2 == 0 && n / 2 <= 20).toSeq.sorted.flatMap { seed =>
      var node = seed
      Seq((seed, 0L, seed)) ++ (1 to 4).map { t =>
        val scored = adj(node).map(d => (h64(s"rw:$seed:$t:$d"), d))
        val mh = scored.map(_._1).min
        node = scored.filter(_._1 == mh).map(_._2).min
        (seed, t.toLong, node)
      }
    }
    assert(got === expectedRows)
    // every hop is a real edge (walks never teleport)
    got.sliding(2).foreach {
      case Seq((w1, s1, n1), (w2, s2, n2)) if w1 == w2 && s2 == s1 + 1 =>
        assert(adj(n1).contains(n2), s"walk $w1 hop $s1->$s2 is not an edge: $n1 -> $n2")
      case _ => ()
    }
  }

  test("graph_ppr: seed neighborhood dominates the top of the ranking") {
    val rows = graft.queries.GraphQueries.graphPpr.run(spark, dir).collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getDouble(2) > 0.0), "non-positive rank in the head")
    // the teleport anchors the seed customers: most of the 5 must sit
    // in the 20-node head of a ~4k-node graph (hub suppliers adjacent
    // to several seeds may legitimately out-rank an individual seed)
    val seedRows = rows.count(r => r.getString(0) == "c" && r.getLong(1) <= 5L)
    assert(seedRows >= 3, s"only $seedRows seed customers in the top-20")
    val vals = rows.map(_.getDouble(2))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b }, "ranking not sorted")
  }

  test("scc: planted cycles resolve; a one-way bridge does not merge them") {
    import spark.implicits._
    // cycle {1,2,3}, one-way bridge 3->4, 2-cycle {4,5}, lone edge 6->7
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (4L, 5L), (5L, 4L), (6L, 7L)).toDF("src", "dst")
    val got = graft.queries.GraphQueries.sccComponents(e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 2L), (5L, 4L, 2L),
      (6L, 6L, 1L), (7L, 7L, 1L)))
  }

  test("scc: an 8-node directed ring needs the full doubling horizon") {
    import spark.implicits._
    // ring 0->1->...->7->0: mutual reachability needs paths of length up
    // to 7 — radius 2^3 = 8 just covers it, 2 doublings (radius 4) must NOT
    val ring = (0L until 8L).map(i => (i, (i + 1) % 8)).toDF("src", "dst")
    val full = graft.queries.GraphQueries.sccComponents(ring, 3).collect()
    assert(full.forall(r => r.getLong(1) == 0L && r.getLong(2) == 8L),
      "radius-8 closure must resolve the 8-ring to one SCC")
    val short = graft.queries.GraphQueries.sccComponents(ring, 2).collect()
    assert(short.exists(_.getLong(1) != 0L),
      "radius-4 closure resolving an 8-ring means the horizon knob is dead")
  }

  test("powerlaw: the trade graph's degree histogram fits a decaying log-log line") {
    val r = graft.queries.GraphQueries.graphPowerlaw.run(spark, dir).head()
    val (nNodes, nPoints, slope, r2) =
      (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4))
    assert(nNodes > 100 && nPoints >= 3, s"degenerate histogram: $nNodes nodes, $nPoints points")
    assert(slope < 0.0, s"degree histogram must decay, slope was $slope")
    assert(r2 > 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
  }

  test("hits: authorities and hubs match an in-memory mirror on a planted bipartite graph") {
    import spark.implicits._
    // hubs 10, 11; authorities 21, 22; 10 cites both, 11 cites only 21
    val pairs = Seq((10L, 21L), (10L, 22L), (11L, 21L)).toDF("c", "s")
    val (aDf, hDf) = graft.queries.GraphQueries.hitsScores(pairs, 4)
    val a = aDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val h = hDf.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // mirror the un-normalized iteration exactly (tiny sums: no float drift)
    var hm = Map(10L -> 1.0, 11L -> 1.0)
    var am = Map[Long, Double]()
    val edges = Seq((10L, 21L), (10L, 22L), (11L, 21L))
    for (_ <- 1 to 4) {
      am = edges.groupBy(_._2).view.mapValues(_.map(e => hm(e._1)).sum).toMap
      hm = edges.groupBy(_._1).view.mapValues(_.map(e => am(e._2)).sum).toMap
    }
    assert(a === am, s"authority vector $a != mirror $am")
    assert(h === hm, s"hub vector $h != mirror $hm")
    // the structural ordering HITS exists to express
    assert(a(21L) > a(22L), "the doubly-cited authority must dominate")
    assert(h(10L) > h(11L), "the hub citing both authorities must dominate")
  }

  test("brandes: path graph accumulates 3/2/1 dependencies and a diamond splits sigma half/half") {
    import spark.implicits._
    def bc(edges: Seq[(Long, Long)], seed: Long): Map[Long, (Long, Double)] = {
      val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("a", "b")
      val seeds = Seq(seed).toDF("node")
      val fwd = graft.queries.GraphQueries.brandesForward(sym, seeds, 4)
      graft.queries.GraphQueries.brandesDeltas(sym, fwd, 4, stateBound = 100L)
        .where(col("node") =!= col("seed"))
        .collect()
        .map(r => r.getAs[Long]("node") ->
          ((r.getAs[Long]("sigma"), r.getAs[Double]("delta")))).toMap
    }
    // path 1-2-3-4-5 from 1: all sigma 1; delta(2)=3, delta(3)=2,
    // delta(4)=1, delta(5)=0 — the telescoping (1+delta) recurrence
    val path = bc(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), seed = 1L)
    assert(path === Map(2L -> ((1L, 3.0)), 3L -> ((1L, 2.0)),
      4L -> ((1L, 1.0)), 5L -> ((1L, 0.0))))
    // diamond 1-{2,3}-4 from 1: sigma(4)=2 via both middles, each middle
    // carries (1/2)*(1+0) = 0.5 — the sigma-ratio split
    val diamond = bc(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), seed = 1L)
    assert(diamond === Map(2L -> ((1L, 0.5)), 3L -> ((1L, 0.5)), 4L -> ((2L, 0.0))))
  }

  test("vhint differential: broadcast-off iteration rounds equal broadcast-on") {
    import spark.implicits._
    // the 100 TB path must be executable, not a docstring: every
    // iterative loop's result is identical whether the |V|-row state
    // table is broadcast (gate-scale plan) or shuffle-joined (the plan
    // a billion-vertex run gets when vhint withholds the hint)
    val und = Seq((0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5), (3, 5), (5, 6))
      .flatMap { case (a, b) => Seq((a.toLong, b.toLong), (b.toLong, a.toLong)) }
      .toDF("src", "dst")
    val symAb = und.select(col("src").as("a"), col("dst").as("b"))
    val seeds = Seq(0L).toDF("node")
    def run(mode: String): Seq[Set[String]] = {
      spark.conf.set("spark.graft.graph.broadcastVertices", mode)
      try {
        val pr = graft.queries.GraphQueries.pagerank(und, 4, 0.85)._1
          .select(col("node"), round(col("pr"), 9).as("pr"))
        val lp = graft.queries.GraphQueries.labelPropagation(und, 3)
        val kc = graft.queries.GraphQueries.kcorePeel(symAb, 2, 4)
        val bf = graft.queries.GraphQueries.bfsLevels(symAb, seeds, 3)
        Seq(pr, lp, kc, bf).map(_.collect().map(_.toString).toSet)
      } finally spark.conf.unset("spark.graft.graph.broadcastVertices")
    }
    val on = run("on")
    val off = run("off")
    val names = Seq("pagerank", "labelPropagation", "kcorePeel", "bfsLevels")
    names.zip(on.zip(off)).foreach { case (n, (x, y)) =>
      assert(x == y, s"$n diverged between broadcast-on and broadcast-off rounds")
    }
    // auto at gate scale takes the broadcast branch (bound << default limit)
    val auto = run("auto")
    names.zip(auto.zip(on)).foreach { case (n, (x, y)) =>
      assert(x == y, s"$n diverged between auto and broadcast-on rounds")
    }
  }
}
