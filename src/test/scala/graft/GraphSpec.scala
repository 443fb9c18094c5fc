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
}
