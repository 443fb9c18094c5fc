package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.{CorpusConfig, CorpusPipeline}

/** Stage-vs-gate parity for the composed LLM-corpus DAG: every
  * CorpusPipeline stage output must equal the corresponding ORACLE-GATED
  * query run on the same corpus — the pipeline is the gate queries'
  * plans composed, so any drift here is a real semantic fork. Also pins
  * the checkpoint-skip and fingerprint-invalidation behavior the bicis
  * Pipeline established (§2.12).
  */
class CorpusPipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def mkdir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Write `docs` as `<dir>/documents.parquet` so the (s, dir)-shaped
    * gate queries can run against it.
    */
  private def asCorpusDir(docs: DataFrame, prefix: String): String = {
    val dir = mkdir(prefix)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def assertSame(stage: DataFrame, gate: DataFrame, what: String): Unit = {
    val s = rows(stage); val g = rows(gate)
    assert(s == g,
      s"$what diverged: stage-only=${(s -- g).take(3)} gate-only=${(g -- s).take(3)}")
  }

  test("every CorpusPipeline stage hash-equals its gate query; skip and fingerprint behave") {
    val docs0 = graft.core.Tables.documents(spark, sfDir)
    // JSONL input: the real ingest format, with two corrupt lines planted
    // to exercise the F4 quarantine path
    val jsonlDir = mkdir("corpus_jsonl")
    val jsonl = s"$jsonlDir/docs.jsonl"
    docs0.toJSON.coalesce(1).write.mode("overwrite").text(s"$jsonlDir/clean")
    val clean = new java.io.File(s"$jsonlDir/clean").listFiles()
      .filter(_.getName.startsWith("part-")).head
    val w = new java.io.PrintWriter(jsonl)
    try {
      w.println("{not json at all")
      scala.io.Source.fromFile(clean).getLines().foreach(w.println)
      w.println("""{"doc_id": null, "text": null}""")
    } finally w.close()

    val outDir = mkdir("corpus_out")
    val res = graft.pipeline.CorpusPipeline.run(spark, jsonl, outDir)

    // ---- ingest: corrupt lines quarantined, clean rows intact ----
    assert(res.nRaw == res.nDocs + 2, s"raw=${res.nRaw} docs=${res.nDocs}")
    val docsStage = spark.read.parquet(s"$outDir/docs")
    assertSame(docsStage, docs0, "docs stage vs source table")

    // ---- funnel ≡ ml_quality_funnel on the same corpus ----
    val srcDir = asCorpusDir(docsStage, "corpus_src")
    assertSame(spark.read.parquet(s"$outDir/funnel"),
      graft.queries.MlQueries.mlQualityFunnel.run(spark, srcDir), "funnel")

    // ---- dedup tiers ≡ their gate queries on the kept corpus ----
    val keptDir = asCorpusDir(spark.read.parquet(s"$outDir/kept"), "corpus_kept")
    assertSame(spark.read.parquet(s"$outDir/pairs"),
      graft.queries.DedupQueries.dedupMinhashLsh.run(spark, keptDir), "pairs")
    assertSame(spark.read.parquet(s"$outDir/clusters"),
      graft.queries.DedupQueries.dedupClusters.run(spark, keptDir), "clusters")
    assertSame(spark.read.parquet(s"$outDir/canonical"),
      graft.queries.DedupQueries.dedupBestSurvivor.run(spark, keptDir), "canonical")
    assertSame(
      graft.queries.DedupQueries.clusterSplitCensus(
        spark.read.parquet(s"$outDir/split")),
      graft.queries.DedupQueries.mlClusterSplit.run(spark, keptDir), "split census")

    // ---- mixture / epoch order ≡ gate queries on the survivors ----
    val survStage = spark.read.parquet(s"$outDir/survivors")
    val survDir = asCorpusDir(survStage, "corpus_surv")
    assertSame(spark.read.parquet(s"$outDir/mixture"),
      graft.queries.MlQueries.mlMixtureEpochs.run(spark, survDir), "mixture")
    assertSame(spark.read.parquet(s"$outDir/epoch_order"),
      graft.queries.MlQueries.mlEpochOrder.run(spark, survDir), "epoch order")

    // ---- survivors = kept minus non-canonical members ----
    val kept = spark.read.parquet(s"$outDir/kept")
    val canonical = spark.read.parquet(s"$outDir/canonical")
    val clusters = spark.read.parquet(s"$outDir/clusters")
    val expectedSurv = kept.join(
      clusters.join(canonical.select(col("best_doc")),
          col("node") === col("best_doc"), "left_anti")
        .select(col("node").as("doc_id")),
      Seq("doc_id"), "left_anti")
    assertSame(survStage, expectedSurv, "survivors")
    assert(res.nSurvivors == res.nKept -
      (clusters.count() - canonical.count()), "survivor arithmetic")

    // ---- sharded output: read-back equals the corpus stage, split
    // directories partition-prune ----
    val corpus = spark.read.parquet(s"$outDir/corpus")
    val shards = spark.read.parquet(s"$outDir/shards")
    assertSame(
      shards.select(corpus.columns.map(col).toIndexedSeq: _*), corpus, "shards read-back")
    assert(new java.io.File(s"$outDir/shards").listFiles()
      .exists(_.getName.startsWith("split=")), "split partition dirs missing")

    // ---- dataset card: parses, constraints all pass on the shipped
    // corpus, residual exact-dup rate is zero post-dedup ----
    val card = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$outDir/dataset_card.json")))
    assert(card.contains("\"key_uniqueness\": {\"metric\": 1.0, \"pass\": true}"),
      s"key uniqueness not clean in card: $card")
    assert(!card.contains("\"pass\": false"), s"failing constraint in card: $card")
    assert(!card.replaceAll("\"dup_rate\": 0\\.0", "").contains("dup_rate\": "),
      s"non-zero residual exact-dup rate after dedup: $card")

    // ---- checkpoint-skip: a second run serves every stage from parquet
    // (stage dirs untouched) and returns the same result ----
    val stamps = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(f => f.getName -> f.lastModified()).toMap
    val res2 = graft.pipeline.CorpusPipeline.run(spark, jsonl, outDir)
    assert(res2 == res, "re-run result drifted")
    val stamps2 = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(f => f.getName -> f.lastModified()).toMap
    assert(stamps2 == stamps, "a checkpointed stage was rewritten on re-run")

    // ---- fingerprint: a config change against the same outDir must
    // recompute, not serve stale targets ----
    val res3 = graft.pipeline.CorpusPipeline.run(spark, jsonl, outDir,
      CorpusConfig(epochSeed = "ep2"))
    assert(res3.nSurvivors == res.nSurvivors)
    val stamps3 = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      .map(f => f.getName -> f.lastModified()).toMap
    assert(stamps3("epoch_order") != stamps("epoch_order"),
      "config change did not invalidate the experiment")
    // the new seed is a genuinely different permutation
    val o1 = spark.read.parquet(s"$outDir/epoch_order")
    assert(rows(o1) != rows(
      graft.queries.MlQueries.mlEpochOrder.run(spark, survDir)),
      "epoch seed change produced the identical order")
  }
}
