package graft

import org.apache.spark.sql.functions._

/** Unit tests for the dedup building blocks that the DuckDB oracle gate
  * cannot falsify on its own — where Spark and oracle SQL share an
  * algorithm, a bug lands identically on both sides and hash-parity
  * still passes, so the semantics are pinned here against hand-computed
  * fixtures.
  */
class DedupOpsSpec extends SparkSpec {

  test("alignmentRuns groups islands PER DIAGONAL (the i,j,k-only grouping counter-example)") {
    import spark.implicits._
    // two matches of the SAME pi on different diagonals: each diagonal
    // partition gives rn = 1, so k = pi - 1 = 9 for BOTH — grouping on
    // (i, j, k) alone would fuse them into a phantom run of 2
    val m = Seq((1L, 2L, 10L, 3L), (1L, 2L, 10L, 5L)).toDF("i", "j", "pi", "pj")
    val got = graft.queries.DedupQueries.alignmentRuns(m, winW = 8).collect()
    assert(got.length === 1)
    assert(got(0).getLong(2) === 8L, // run of 1 window -> 1 + 8 - 1 words
      s"phantom cross-diagonal run: ${got(0)}")
  }

  test("alignmentRuns merges consecutive windows on one diagonal and takes the max across pairs") {
    import spark.implicits._
    val m = Seq(
      // pair (1,2): 3 consecutive windows on diagonal 7 -> run 3 -> 10 words
      (1L, 2L, 10L, 3L), (1L, 2L, 11L, 4L), (1L, 2L, 12L, 5L),
      // plus a lone off-diagonal match that must not extend the run
      (1L, 2L, 20L, 1L),
      // pair (1,3): two separate islands on one diagonal -> max run 2 -> 9
      (1L, 3L, 5L, 5L), (1L, 3L, 6L, 6L), (1L, 3L, 9L, 9L)
    ).toDF("i", "j", "pi", "pj")
    val got = graft.queries.DedupQueries.alignmentRuns(m, winW = 8)
      .orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 10L), (1L, 3L, 9L)))
  }
}
