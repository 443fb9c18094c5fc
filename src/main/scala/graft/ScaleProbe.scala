package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup scale probe: generates synthetic corpora with planted near-dups
  * at increasing sizes and times the prefix-filtered pair pipeline
  * (shingle → hash → PPJoin candidates → exact verify). The point is the
  * GROWTH CURVE, not the absolute numbers: candidate generation is an
  * equi-join whose output tracks true collisions, so wall time should
  * grow ~linearly in docs while the naive all-pairs space grows
  * quadratically (50k docs = 1.25B pairs).
  *
  * Usage: tools/run.sh graft.ScaleProbe [sizes...]   (default 5000 20000 50000)
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(5000, 20000, 50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocabSql = (0 until 1000).map(i => s"'w$i'").mkString("array(", ", ", ")")
    sizes.foreach { n =>
      val dir = java.nio.file.Files.createTempDirectory(s"probe$n").toString
      // 80 pseudo-random vocab words per doc (hash-indexed — executor-side,
      // deterministic); every 20th doc repeats the previous doc's first 75
      // words -> planted near-dup pairs at J ≈ 0.88
      spark.range(n).select(col("id").as("doc_id"), expr(
        s"""concat_ws(' ', transform(sequence(1, 80), j ->
           |  element_at($vocabSql, 1 + pmod(hash(IF(id % 20 = 0 AND id > 0 AND j <= 75, id - 1, id), j), 1000))))"""
          .stripMargin).as("text"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val t0 = System.nanoTime()
      val pairs = graft.queries.DedupQueries
        .prefixFilteredPairs(graft.queries.DedupQueries.docHashes(spark, dir))
        .where(col("sim") >= 0.8).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] docs=$n%6d near_dup_pairs=$pairs%6d wall=$secs%6.1f s")

      // funnel leg: the composed gopher+lang+exact-dedup pass — one scan
      // + one digest shuffle, so the curve should stay ~linear with a
      // much smaller constant than the pair build. Separate corpus
      // variant with an English stopword block prepended (the w-vocab
      // alone fails the language gate), leaving the pair curve untouched.
      val dirF = java.nio.file.Files.createTempDirectory(s"probeF$n").toString
      spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), concat(lit("the and of to in "), col("text")).as("text"))
        .write.mode("overwrite").parquet(s"$dirF/documents.parquet")
      val t1 = System.nanoTime()
      val kept = graft.queries.MlQueries.mlQualityFunnel.run(spark, dirF)
        .where(col("keep") === 1).count()
      val fsecs = (System.nanoTime() - t1) / 1e9
      println(f"[scaleprobe] docs=$n%6d funnel_kept=$kept%6d wall=$fsecs%6.1f s")
      // sketch leg: ONE aggregation pass over the full token stream
      // builds the whole sketch family concurrently — Count-Min (32 KB),
      // Bloom (512 B), KMV (~2 KB) — on the production hash tier
      // (xxhash64; the sketches are hash-agnostic). State is constant in
      // corpus size, partials map-side combine, so the curve should be
      // a flat-constant-plus-linear-scan: the 100 TB story is "three
      // sketches for the price of one pass and 35 KB of shuffle".
      graft.functions.CMSketch.register(spark)
      graft.functions.BloomSketch.register(spark)
      graft.functions.KMVDistinct.register(spark)
      val t2 = System.nanoTime()
      val sk = spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("word"))
        .select(expr("xxhash64(word)").as("hv"))
        .agg(expr("cms_sketch(hv, 4, 1024)").as("cms"),
          expr("bloom_sketch(hv, 4096, 4)").as("bf"),
          expr("kmv_distinct(hv, 256)").as("kmv")).head()
      val ssecs = (System.nanoTime() - t2) / 1e9
      println(f"[scaleprobe] docs=$n%6d tokens=${80L * n}%8d kmv_distinct_est=${sk.getDouble(2)}%8.1f wall=$ssecs%6.1f s")

      // graph leg: the pagerank power-iteration core on a synthetic
      // bipartite graph with zipf-ish hub skew (edge count = 20·n, hubs
      // get a large share — the crawl-graph shape). The edge table is
      // built/cached once; per-round cost is one broadcast join + one
      // map-side-combined sum over it, so the curve should be linear in
      // EDGES with a fixed per-round constant — iterations don't
      // multiply shuffled bytes, the 100 TB story for iterative graph
      // ops.
      val t3 = System.nanoTime()
      val m = 20L * n
      val raw = spark.range(m).select(
        (pmod(expr("xxhash64(id, 1)"), lit(n.toLong)) * 2).as("c"),
        (pmod(pmod(expr("xxhash64(id, 2)"), lit(97L)) *
          pmod(expr("xxhash64(id, 3)"), lit(math.max(1L, n / 97L))),
          lit(math.max(1L, n / 10L))) * 2 + 1).as("s"))
      val und = raw.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(raw.select(col("s").as("src"), col("c").as("dst")))
      val (pr, nvg) = graft.queries.GraphQueries.pagerank(und, 6, 0.85)
      val topMass = pr.orderBy(col("pr").desc).limit(10)
        .agg(sum(col("pr"))).head().getDouble(0)
      val gsecs = (System.nanoTime() - t3) / 1e9
      println(f"[scaleprobe] docs=$n%6d edges=${2 * m}%9d vertices=$nvg%7d top10_mass=$topMass%5.3f wall=$gsecs%6.1f s")

      // probe corpora are throwaway — don't leave 2 parquet copies per
      // size accumulating in /tmp across sweeps
      Seq(dir, dirF).foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(d))
      }
    }
    spark.stop()
  }
}
