package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** BPE training kernel: planted fixtures with hand-computable merges,
  * the left-to-right non-overlap rewrite law, and an independence proof
  * against a from-scratch sequential reference (the KMeans-proof
  * pattern) sharing only the contract — pair counts with overlaps,
  * (count DESC, left, right) tiebreak, non-overlapping rewrite.
  */
class BpeSpec extends SparkSpec {

  /** Sequential reference BPE — plain Scala collections, no Spark. */
  private def refBpe(texts: Seq[String], n: Int): Seq[Bpe.Merge] = {
    val words = scala.collection.mutable.Map[String, Long]()
    for (t <- texts; w <- "[a-z0-9]+".r.findAllIn(t.toLowerCase))
      words(w) = words.getOrElse(w, 0L) + 1L
    var v: Map[String, Vector[String]] =
      words.keysIterator.map(w => w -> (w + Bpe.EndMark).map(_.toString).toVector).toMap
    val out = Seq.newBuilder[Bpe.Merge]
    var i = 1
    var done = false
    while (i <= n && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, toks) <- v; j <- 0 until toks.length - 1)
        pc((toks(j), toks(j + 1))) = pc.getOrElse((toks(j), toks(j + 1)), 0L) + words(w)
      if (pc.isEmpty) done = true
      else {
        val ((a, b), c) = pc.minBy { case ((x, y), m) => (-m, x, y) }
        out += Bpe.Merge(i, a, b, c)
        v = v.map { case (w, toks) =>
          val r = Vector.newBuilder[String]
          var j = 0
          while (j < toks.length) {
            if (j + 1 < toks.length && toks(j) == a && toks(j + 1) == b) { r += a + b; j += 2 }
            else { r += toks(j); j += 1 }
          }
          w -> r.result()
        }
        i += 1
      }
    }
    out.result()
  }

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("planted corpus learns the dominant pair first") {
    // "ab" starts every word of the 5-copy text; (a, b) must win rank 1
    // with count 15: 3 distinct words × 5 occurrences × one (a,b) each.
    val m = Bpe.fit(docs(Seq.fill(5)("abc abd abe").mkString(" ")), 1)
    assert(m === Seq(Bpe.Merge(1, "a", "b", 15L)))
  }

  test("rewrite is left-to-right non-overlapping: aaa + (a,a) -> [aa, a]") {
    import spark.implicits._
    val v = Seq(("aaa", 1L, ";;a;;a;;a;;_;;")).toDF("word", "cnt", "enc")
    val got = v.select(Bpe.applyMerge(col("enc"), "a", "a")).collect()(0).getString(0)
    assert(got === ";;aa;;a;;_;;")
    // and a 4-run pairs up fully: [aa, aa]
    val v4 = Seq(("aaaa", 1L, ";;a;;a;;a;;a;;_;;")).toDF("word", "cnt", "enc")
    val got4 = v4.select(Bpe.applyMerge(col("enc"), "a", "a")).collect()(0).getString(0)
    assert(got4 === ";;aa;;aa;;_;;")
  }

  test("boundary anchoring: no mid-token false merge (ba,a vs a,a)") {
    import spark.implicits._
    val v = Seq(("x", 1L, ";;ba;;a;;_;;")).toDF("word", "cnt", "enc")
    val got = v.select(Bpe.applyMerge(col("enc"), "a", "a")).collect()(0).getString(0)
    assert(got === ";;ba;;a;;_;;") // unchanged: "ba" ends in 'a' but is not token "a"
  }

  test("tie on count breaks by (left, right) ascending") {
    // two disjoint digram worlds with identical counts: "xy xy" vs "ab ab"
    // — ALL pairs count 2 (including the end-mark pairs (y,_) and (b,_)),
    // so the winner is decided purely by the (left, right) tiebreak: (a,b)
    val m = Bpe.fit(docs("xy xy ab ab"), 1)
    assert(m.head.left === "a" && m.head.right === "b" && m.head.count === 2L)
  }

  test("independence proof: Bpe.fit == sequential reference on 6 seeded corpora") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 6) {
      val alphabet = "abcdef"
      val texts = (1 to 8).map { _ =>
        (1 to 30).map { _ =>
          val len = 1 + rnd.nextInt(5)
          (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        }.mkString(" ")
      }
      val n = 1 + rnd.nextInt(10)
      val got = Bpe.fit(docs(texts: _*), n)
      val want = refBpe(texts, n)
      assert(got === want, s"trial $trial (n=$n)")
    }
  }

  test("vocabAfter replays fit's rewrites exactly (chained projection == loop)") {
    val texts = Seq("the quick brown fox the quick", "jumps over the lazy dog the")
    val merges = Bpe.fit(docs(texts: _*), 5)
    val replayed = Bpe.vocabAfter(Bpe.vocab0(docs(texts: _*)), merges)
    // re-counting pairs on the replayed frame and merging once more must
    // agree with running fit one step further
    val next = graft.ops.Bpe.pairCounts(replayed)
      .orderBy(col("c").desc, col("a"), col("b")).limit(1).collect()(0)
    val six = Bpe.fit(docs(texts: _*), 6).last
    assert((next.getString(0), next.getString(1), next.getLong(2)) ===
      ((six.left, six.right, six.count)))
  }

  test("production merge count: heap-argmax local loop == sequential reference at 1000 merges") {
    // the r10 caveat was the PER-MERGE Spark job; the local loop must
    // track the from-scratch reference exactly deep into the merge
    // sequence (incremental pair deltas == full recounts, and the r12
    // lazy-invalidation heap == the full argmax scan), including
    // the early-exhaustion rule if pairs run out on either side.
    val rnd = new scala.util.Random(7)
    val alphabet = "abcdefghijkl"
    val texts = (1 to 24).map { _ =>
      (1 to 160).map { _ =>
        val len = 2 + rnd.nextInt(9)
        (1 to len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.mkString(" ")
    }
    val got = Bpe.fit(docs(texts: _*), 1000)
    val want = refBpe(texts, 1000)
    assert(got === want)
  }

  test("dispatch differential: local loop == distributed per-merge loop (16 merges)") {
    val texts = Seq("the quick brown fox the quick", "jumps over the lazy dog the",
      "pack my box with five dozen jugs", "how vexingly quick daft zebras jump")
    val local = Bpe.fitVocab(Bpe.vocab0(docs(texts: _*)), 16)
    val dist = Bpe.fitVocabDistributed(Bpe.vocab0(docs(texts: _*)), 16)
    assert(local === dist)
  }

  test("degenerate corpus: fewer merges than requested, no crash") {
    // single 1-char word: encoding [a, _] has one pair; after merging it
    // nothing is left to merge
    val m = Bpe.fit(docs("a a a"), 5)
    assert(m === Seq(Bpe.Merge(1, "a", Bpe.EndMark, 3L)))
  }
}
