package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.core.{Ingest, Sinks}
import graft.ops.TextOps
import graft.queries.{DedupQueries, MlQueries}

/** The composed LLM-corpus DAG — what a user of the ~140 LLM-pipeline
  * operators actually RUNS: one checkpointed pipeline from raw JSONL to
  * training-ready sharded parquet, built from the SAME frame-level
  * stage bodies the oracle-gated queries execute (qualityFunnelFlags,
  * hashesOfDocs/minhashVerifiedPairs, Components CC, bestSurvivors,
  * clusterSplitAssign, mixtureEpochsFrame, epochOrderFrame), so stage
  * output ≡ gate-query output is a SPEC (CorpusPipelineSpec), not a
  * hope. Structural analog of the bicis [[Pipeline]] (reference
  * build_dataset.py:46-53's Luigi chain): parquet stage targets with
  * exists-skip, a config fingerprint that invalidates a stale outDir,
  * and an S8 fails/census sidecar per lossy stage.
  *
  * Stage DAG (all parquet-checkpointed under outDir):
  *
  *   docs        JSONL ingest (PERMISSIVE; corrupt rows quarantined —
  *               F4 row-skip) → typed (doc_id, text, lang, source,
  *               n_chars); sidecar ingest_census.json
  *   funnel      per-doc quality flags (Gopher rules, lang-ID gate,
  *               exact keep-first) ≡ ml_quality_funnel
  *   kept        docs surviving the funnel; sidecar fails_kept.json
  *   pairs       MinHash-LSH candidates + exact-Jaccard verify ≥ τ over
  *               kept ≡ dedup_minhash_lsh
  *   clusters    connected components over the τ-pairs ≡ dedup_clusters
  *               (LSH tier: identical when band recall = 1, which
  *               dedup_lsh_recall audits)
  *   canonical   per-cluster best survivor (longest text, id tiebreak)
  *               ≡ dedup_best_survivor
  *   survivors   kept minus non-canonical cluster members — the
  *               deduplicated corpus; sidecar fails_survivors.json
  *   split       leakage-aware 80/10/10 assignment keyed on the cluster
  *               rep (near-dups never straddle a split fence)
  *               ≡ ml_cluster_split census; sidecar split_census.json
  *   mixture     per-source α=0.5 temperature shares + epoch counts for
  *               the token budget ≡ ml_mixture_epochs (dataset-card
  *               sidecar mixture.json)
  *   epoch_order deterministic shard/pos visit order ≡ ml_epoch_order
  *   corpus      survivors ⋈ split ⋈ epoch order — the final table
  *   shards/     Sinks.shardedParquet partitioned by (split, source),
  *               sorted by (shard, pos): partition-pruned by split for
  *               eval readers, row-group-skippable on the visit order
  *
  * Scale shape: every stage is one of the proven gate plans — the only
  * corpus-text shuffles are the signature build and the shard write;
  * pairs/clusters/canonical move ids and digests only. The whole DAG is
  * timed end-to-end at 200k docs by ScaleProbe's corpus-pipeline leg.
  */
final case class CorpusConfig(
    tau: Double = 0.8,                      // near-dup Jaccard threshold
    budgetTokens: Long = 1000000L,          // mixture epoch planner budget
    epochSeed: String = "ep1",              // epoch permutation salt
    epochShards: Int = 8,                   // epoch-order shard count
    maxRecordsPerFile: Long = 1000000L)     // shard file cap

final case class CorpusResult(
    nRaw: Long, nDocs: Long, nKept: Long, nSurvivors: Long,
    nClusters: Long, splitCounts: Map[String, Long])

object CorpusPipeline {

  /** The documents-table schema the JSONL must carry (TESTDATA parity:
    * doc_id, text, lang, source, n_chars).
    */
  val docSchema: StructType = new StructType()
    .add("doc_id", LongType).add("text", StringType)
    .add("lang", StringType).add("source", StringType)
    .add("n_chars", LongType)

  def run(spark: SparkSession, jsonlPath: String, outDir: String,
          cfg: CorpusConfig = CorpusConfig(), force: Boolean = false): CorpusResult = {
    new java.io.File(outDir).mkdirs()
    def p(name: String) = s"$outDir/$name"
    TextOps.ensureFunctions(spark)

    // same stale-experiment guard as Pipeline.run: a config change
    // against an existing outDir recomputes instead of serving stale
    // targets. Crash discipline (r9 ADVICE): a missing fingerprint next
    // to an existing docs stage means a run DIED before committing —
    // its checkpoints may belong to any config, so force; and a FORCED
    // run deletes the old fingerprint up front, so if IT crashes
    // mid-way the retry forces again instead of serving the
    // half-recomputed mix. The new fingerprint commits only on success.
    val cfgPath = p("config.fingerprint")
    val fingerprint = (cfg, jsonlPath).toString
    val force0 = force ||
      (if (graft.core.Fs.exists(spark, cfgPath))
         graft.core.Fs.readString(spark, cfgPath) != fingerprint
       else graft.core.Fs.exists(spark, p("docs")))
    if (force0) graft.core.Fs.delete(spark, cfgPath)

    // ---- ingest (F4: corrupt lines quarantined, not fatal) ----
    val raw = Ingest.readJsonl(spark, jsonlPath, docSchema).cache()
    val docs = Pipeline.stage(spark, p("docs"), force0) {
      raw.where(col("_corrupt").isNull &&
          col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          coalesce(col("n_chars"), length(col("text")).cast("long")).as("n_chars"))
    }
    // one PERMISSIVE-read line count, shared by the census and the
    // final CorpusResult (r9 ADVICE: a second spark.read.text pass
    // counted physical lines — blank lines included — so the two
    // reported raw counts could disagree for the same input)
    val nRawCount = raw.count()
    val censusPath = p("ingest_census.json")
    if (force0 || !graft.core.Fs.exists(spark, censusPath)) {
      val nDocs = docs.count()
      graft.core.Fs.writeString(spark, censusPath,
        s"""{"input_lines": $nRawCount, "parsed_docs": $nDocs, "quarantined": ${nRawCount - nDocs}}""")
    }
    raw.unpersist()

    // ---- quality funnel (≡ ml_quality_funnel) ----
    val funnel = Pipeline.stage(spark, p("funnel"), force0)(
      MlQueries.qualityFunnelFlags(docs))
    val kept = Pipeline.stage(spark, p("kept"), force0)(
      docs.join(funnel.where(col("keep") === 1).select(col("doc_id")), "doc_id"))
    if (force0 || !graft.core.Fs.exists(spark, p("fails_kept.json")))
      Sinks.failsReport(docs, kept, "doc_id", p("fails_kept.json"))

    // ---- near-dup tier: LSH candidates → verify → CC → canonical ----
    // the signature table is the stage analog of the session memo: built
    // once, consumed by pairs + (via pairs) everything downstream
    val hs = DedupQueries.hashesOfDocs(spark, kept)
    val pairs = Pipeline.stage(spark, p("pairs"), force0)(
      DedupQueries.minhashVerifiedPairs(hs, cfg.tau))
    val clusters = Pipeline.stage(spark, p("clusters"), force0)(
      graft.ops.Components.connectedComponents(
          pairs.where(col("sim") >= cfg.tau).select(col("i"), col("j")))
        .select(col("node"), col("rep")))
    val canonical = Pipeline.stage(spark, p("canonical"), force0)(
      DedupQueries.bestSurvivors(clusters, kept))
    val survivors = Pipeline.stage(spark, p("survivors"), force0) {
      // drop non-canonical cluster members; singletons pass through
      val drop = clusters.join(
          canonical.select(col("best_doc")), col("node") === col("best_doc"), "left_anti")
        .select(col("node").as("doc_id"))
      kept.join(drop, Seq("doc_id"), "left_anti")
    }
    if (force0 || !graft.core.Fs.exists(spark, p("fails_survivors.json")))
      Sinks.failsReport(kept, survivors, "doc_id", p("fails_survivors.json"))

    // ---- leakage-aware split (≡ ml_cluster_split) ----
    // assignment is keyed on the cluster rep over the WHOLE kept corpus
    // (the fence is a property of the group, not of who survived), then
    // applied to survivors
    val split = Pipeline.stage(spark, p("split"), force0)(
      DedupQueries.clusterSplitAssign(kept, clusters))
    val splitCensusPath = p("split_census.json")
    if (force0 || !graft.core.Fs.exists(spark, splitCensusPath)) {
      val rows = DedupQueries.clusterSplitCensus(split).orderBy(col("split")).collect()
      graft.core.Fs.writeString(spark, splitCensusPath,
        rows.map(r => s""""${r.getString(0)}": {"n_docs": ${r.getLong(1)}, "n_groups": ${r.getLong(2)}, "n_chars": ${r.getLong(3)}, "id_sum": ${r.getLong(4)}}""")
          .mkString("{", ", ", "}"))
    }

    // ---- mixture + epoch order over the final corpus ----
    val mixture = Pipeline.stage(spark, p("mixture"), force0)(
      MlQueries.mixtureEpochsFrame(survivors, cfg.budgetTokens))
    if (force0 || !graft.core.Fs.exists(spark, p("mixture.json"))) {
      val rows = mixture.orderBy(col("source")).collect()
      graft.core.Fs.writeString(spark, p("mixture.json"),
        rows.map(r => s""""${r.getString(0)}": {"n_tokens": ${r.getLong(1)}, "share": ${r.getDouble(2)}, "epochs": ${r.getDouble(3)}}""")
          .mkString("{", ", ", "}"))
    }
    val order = Pipeline.stage(spark, p("epoch_order"), force0)(
      MlQueries.epochOrderFrame(survivors, cfg.epochSeed, cfg.epochShards))

    // ---- dataset card: the release-notes sidecar composing the
    // validation gate (ml_constraint_audit's plan over the SHIPPED
    // corpus) with the per-source residual dup-rate census
    // (ml_dedup_rate_by_source's plan — post-dedup rates should be ~0;
    // a non-zero residual is the near-dup tier's exact-tier blind spot
    // made visible) ----
    if (force0 || !graft.core.Fs.exists(spark, p("dataset_card.json"))) {
      val cons = MlQueries.constraintAuditFrame(survivors).orderBy(col("con"))
        .collect().map(r => s""""${r.getString(0)}": {"metric": ${r.getDouble(1)}, "pass": ${r.getBoolean(2)}}""")
      val rates = DedupQueries.dedupRateBySourceFrame(survivors).orderBy(col("source"))
        .collect().map(r => s""""${r.getString(0)}": {"n_docs": ${r.getLong(1)}, "dup_rate": ${r.getDouble(4)}, "n_cross": ${r.getLong(5)}}""")
      graft.core.Fs.writeString(spark, p("dataset_card.json"),
        s"""{"constraints": ${cons.mkString("{", ", ", "}")}, "dup_rate_by_source": ${rates.mkString("{", ", ", "}")}}""")
    }

    // ---- final corpus + sharded training layout ----
    val corpus = Pipeline.stage(spark, p("corpus"), force0)(
      survivors
        .join(split.select(col("doc_id"), col("split")), "doc_id")
        .join(order, "doc_id"))
    val shardsPath = p("shards")
    if (force0 || !graft.core.Fs.exists(spark, s"$shardsPath/_SUCCESS"))
      Sinks.shardedParquet(corpus, shardsPath,
        partitionCols = Seq("split", "source"), sortCols = Seq("shard", "pos"),
        maxRecordsPerFile = cfg.maxRecordsPerFile)

    graft.core.Fs.writeString(spark, cfgPath, fingerprint)

    val splitCounts = split.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    CorpusResult(
      nRaw = nRawCount,
      nDocs = docs.count(), nKept = kept.count(),
      nSurvivors = survivors.count(), nClusters = canonical.count(),
      splitCounts = splitCounts)
  }
}
