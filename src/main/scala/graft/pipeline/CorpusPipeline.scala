package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.core.{Fs, Ingest, Sinks}
import graft.ops.{Ckpt, IvfIndex, TextOps}
import graft.queries.{DedupQueries, MlQueries}

/** The composed LLM-corpus DAG — what a user of the ~140 LLM-pipeline
  * operators actually RUNS: one checkpointed pipeline from raw JSONL to
  * training-ready sharded parquet, built from the SAME frame-level
  * stage bodies the oracle-gated queries execute (qualityFunnelFlags,
  * hashesOfDocs/minhashVerifiedPairs, Components CC, bestSurvivors,
  * clusterSplitAssign, mixtureEpochsFrame, epochOrderStableFrame), so stage
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
  *   digests     (doc_id, md5 digest) of every parsed doc — the exact-
  *               tier state [[append]] checks new batches against
  *   signatures  the per-doc shingle-hash signature table — the
  *               production "signature table per corpus snapshot"
  *               every dedup pass reuses ([[append]] never re-shingles
  *               the corpus)
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
  *   epoch_order deterministic APPEND-STABLE shard/pos visit order
  *               (sparse hash-key pos) ≡ ml_epoch_order_stable
  *   corpus      survivors ⋈ split ⋈ epoch order — the final table
  *   shards/     Sinks.shardedParquet partitioned by (split, source),
  *               sorted by (shard, pos): partition-pruned by split for
  *               eval readers, row-group-skippable on the visit order
  *
  * INCREMENTAL MODE ([[append]]): a daily batch lands as DELTA stages
  * under `batches/<tag>/` (docs/funnel/kept/digests/signatures/pairs —
  * all batch-scaled: the funnel's exact tier joins the persisted digest
  * state, the pair delta band-joins the batch's signatures against the
  * persisted signature table), committed atomically to `appends.tsv`,
  * and the id-sized derived tier (clusters→shards) is recomputed over
  * the MERGED views — so run-then-append equals a full rerun on the
  * union EXACTLY (CorpusPipelineSpec proves survivor/split/corpus
  * equality), including the retraction case where a longer batch doc
  * displaces a previously-published base survivor. Precondition
  * (checked): batch doc_ids strictly exceed all prior doc_ids — the
  * production "dense ids assigned at ingest" discipline, and what makes
  * keep-first/lower-id tiebreaks composition-stable. Reference analog:
  * Luigi's target-exists incrementality (split.py:48,56,65) done at the
  * batch level instead of the task level.
  *
  * Scale shape: every stage is one of the proven gate plans — the only
  * corpus-text shuffles are the signature build and the shard write;
  * pairs/clusters/canonical move ids and digests only. A 100 TB append
  * re-shingles NOTHING: new text work is the batch's, corpus-side work
  * is one map over the persisted signature table plus id-sized joins.
  * The whole DAG is timed end-to-end at 200k docs by ScaleProbe's
  * corpus-pipeline leg; the append leg times base+batch against the
  * full rerun.
  */
final case class CorpusConfig(
    tau: Double = 0.8,                      // near-dup Jaccard threshold
    budgetTokens: Long = 1000000L,          // mixture epoch planner budget
    epochSeed: String = "ep1",              // epoch permutation salt
    epochShards: Int = 8,                   // epoch-order shard count
    maxRecordsPerFile: Long = 1000000L,     // shard file cap
    phashDedup: Boolean = false,            // optional media near-dup stage (≡ multimodal_phash_dedup)
    semanticDedup: Boolean = false,         // optional SemDeDup stage (≡ dedup_semantic)
    semanticTau: Double = 0.35,             // semantic drop threshold
    embeddingsPath: String = "",            // (vec_id = doc_id, embedding) parquet for the semantic/ann stages
    bpeMerges: Int = 0,                     // >0: ship a BPE tokenizer trained on the train split (≡ text_bpe_merges)
    packBudget: Int = 0,                    // >0: materialize packed token-id sequences of this length (needs bpeMerges > 0)
    freezeTokenizer: Boolean = false,       // train the tokenizer ONCE (first derive) and freeze merges + token ids — appends stop rewriting the packed tier wholesale
    annIndex: Boolean = false,              // maintain a persisted IVF index over survivors' vectors
    annCells: Int = 16,                     // coarse cell count for the ann index
    annRetrainPsi: Double = 0.0,            // >0: retrain the quantizer when cell-population PSI vs the last-fit census crosses this
    knnGraph: Boolean = false,              // maintain a persisted k-NN GRAPH index (graph-served ANN) over survivors' vectors
    knnGraphK: Int = 8,                     // neighbor-list width of the graph artifact
    knnGraphRounds: Int = 2,                // NN-Descent rounds at build
    knnGraphBeam: Int = 8,                  // insert-time beam width
    knnGraphHops: Int = 6)                  // insert-time hop budget

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

  // ---------------- append registry ----------------

  private def appendsPath(outDir: String) = s"$outDir/appends.tsv"
  private def batchDir(outDir: String, tag: String) = s"$outDir/batches/$tag"

  /** Committed (tag, batchJsonlPath) list, commit order. The commit is
    * ONE small-file write, so a crash leaves either the old list (batch
    * stages exist but are invisible — a re-run resumes and re-commits)
    * or the new list (fully visible) — never a half-applied batch.
    */
  private[graft] def appliedBatches(spark: SparkSession, outDir: String): Seq[(String, String)] =
    if (!Fs.exists(spark, appendsPath(outDir))) Seq.empty
    else Fs.readString(spark, appendsPath(outDir)).linesIterator
      .filter(_.nonEmpty).map { l =>
        val a = l.split("\t", 2); (a(0), if (a.length > 1) a(1) else "")
      }.toSeq

  private def commitBatch(spark: SparkSession, outDir: String, tag: String,
                          path: String): Unit = {
    val prev = if (Fs.exists(spark, appendsPath(outDir)))
      Fs.readString(spark, appendsPath(outDir)) else ""
    Fs.writeString(spark, appendsPath(outDir), prev + s"$tag\t$path\n")
  }

  private[graft] def batchTag(batchJsonlPath: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(batchJsonlPath.getBytes("UTF-8"))
    d.take(6).map(b => f"$b%02x").mkString
  }

  /** Base stage ∪ committed batch deltas of the same stage name. */
  private def mergedStage(spark: SparkSession, outDir: String, name: String,
                          tags: Seq[String]): DataFrame =
    tags.foldLeft(spark.read.parquet(s"$outDir/$name")) { (df, t) =>
      df.unionByName(spark.read.parquet(s"${batchDir(outDir, t)}/$name"))
    }

  // ---------------- shared stage bodies ----------------

  /** JSONL → typed docs stage + census sidecars under `areaDir` (the
    * base outDir or a batch delta dir). Returns (docs, rawLineCount).
    * One PERMISSIVE-read line count serves the census AND the result
    * (r9 ADVICE: a second spark.read.text pass counted physical lines —
    * blank lines included — and could disagree); a warm re-run reads
    * the persisted count instead of re-scanning the input.
    */
  private def ingestStages(spark: SparkSession, jsonlPath: String,
                           areaDir: String, force0: Boolean): (DataFrame, Long) = {
    val raw = Ingest.readJsonl(spark, jsonlPath, docSchema).cache()
    val docs = Pipeline.stage(spark, s"$areaDir/docs", force0) {
      raw.where(col("_corrupt").isNull &&
          col("doc_id").isNotNull && col("text").isNotNull)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          coalesce(col("n_chars"), length(col("text")).cast("long")).as("n_chars"))
    }
    val rawCountPath = s"$areaDir/raw_count"
    val nRaw =
      if (!force0 && Fs.exists(spark, rawCountPath))
        Fs.readString(spark, rawCountPath).trim.toLong
      else {
        val n = raw.count()
        Fs.writeString(spark, rawCountPath, n.toString); n
      }
    val censusPath = s"$areaDir/ingest_census.json"
    if (force0 || !Fs.exists(spark, censusPath)) {
      val nDocs = docs.count()
      Fs.writeString(spark, censusPath,
        s"""{"input_lines": $nRaw, "parsed_docs": $nDocs, "quarantined": ${nRaw - nDocs}}""")
    }
    raw.unpersist()
    (docs, nRaw)
  }

  private def derivedFpOf(fingerprint: String, tags: Seq[String]): String =
    fingerprint + "|" + tags.mkString(",")

  /** The id-sized derived tier (clusters → canonical → survivors →
    * split → mixture → epoch order → corpus → shards) over the MERGED
    * kept/pairs views — shared verbatim by [[run]] and [[append]], which
    * is exactly why run-then-append ≡ full-rerun: everything downstream
    * of the pair set recomputes from the same merged inputs. Returns
    * (splitCounts, nSurvivors, nClusters).
    */
  /** `forceBase` = a config-change / explicit force (run's force0), as
    * opposed to the append-driven derived-fingerprint force folded into
    * `forceD`: freeze-mode stages are exempt from the LATTER only — a
    * config change must still retrain the frozen tokenizer and rewrite
    * the packed layout, or the stale-experiment fingerprint guard is
    * defeated (r16 review).
    */
  private def deriveTier(spark: SparkSession, outDir: String, cfg: CorpusConfig,
                         kept: DataFrame, hs: DataFrame,
                         clusters0: => DataFrame,
                         forceD: Boolean,
                         forceBase: Boolean): (Map[String, Long], Long, Long) = {
    def p(name: String) = s"$outDir/$name"
    // clusters0 is caller-supplied BY NAME (evaluated only when the
    // stage actually recomputes): run() passes the full CC over the
    // pair set; append passes Components.mergeBatch over the PERSISTED
    // prior map + the batch pair deltas — batch-sized cluster
    // maintenance, proved ≡ full CC by ComponentsSpec and the
    // dedup_clusters_incremental gate row
    val clusters = Pipeline.stage(spark, p("clusters"), forceD)(clusters0)
    val canonical = Pipeline.stage(spark, p("canonical"), forceD)(
      DedupQueries.bestSurvivors(clusters, kept))
    val survivors = Pipeline.stage(spark, p("survivors"), forceD) {
      // drop non-canonical cluster members; singletons pass through
      val drop = clusters.join(
          canonical.select(col("best_doc")), col("node") === col("best_doc"), "left_anti")
        .select(col("node").as("doc_id"))
      kept.join(drop, Seq("doc_id"), "left_anti")
    }
    if (forceD || !Fs.exists(spark, p("fails_survivors.json")))
      Sinks.failsReport(kept, survivors, "doc_id", p("fails_survivors.json"))

    // ---- optional media/embedding dedup tiers (config-gated) ----
    // drop passes past the text near-dup tier, built from the SAME
    // frame bodies their gate queries execute (phashDedupPairs ≡
    // multimodal_phash_dedup, semanticDedupFrame ≡ dedup_semantic —
    // CorpusPipelineSpec proves both parities); they live inside the
    // derived tier, so append-mode recomputation extends the full-rerun
    // equivalence to them for free
    val survivors2 = {
      var s2 = survivors
      if (cfg.phashDedup) {
        val ppairs = Pipeline.stage(spark, p("phash_pairs"), forceD)(
          graft.queries.EmbedQueries.phashDedupPairs(spark, s2))
        s2 = Pipeline.stage(spark, p("phash_survivors"), forceD) {
          // min-id survivor per hamming cluster (the dedup_survivors policy)
          val drop = graft.ops.Components.connectedComponents(
              ppairs.select(col("i"), col("j")))
            .where(col("node") =!= col("rep")).select(col("node").as("doc_id"))
          s2.join(drop, Seq("doc_id"), "left_anti")
        }
      }
      if (cfg.semanticDedup) {
        require(cfg.embeddingsPath.nonEmpty,
          "semanticDedup needs embeddingsPath (a (vec_id = doc_id, embedding) parquet)")
        val v = spark.read.parquet(cfg.embeddingsPath)
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .join(s2.select(col("doc_id").as("vec_id")), "vec_id")
        val k = math.ceil(math.sqrt(math.max(v.count(), 1L).toDouble)).toLong
        val drops = Pipeline.stage(spark, p("semantic_drops"), forceD)(
          graft.queries.EmbedQueries.semanticDedupFrame(v, k, cfg.semanticTau))
        s2 = Pipeline.stage(spark, p("semantic_survivors"), forceD)(
          s2.join(drops.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti"))
      }
      s2
    }

    // ---- optional ANN serving-index maintenance (config-gated) ----
    // the composition a production corpus actually runs: the persisted
    // IVF index under the out dir holds EXACTLY the current survivors'
    // vectors. The first derive BUILDS it; every later derive
    // reconciles by DELTA — newly-surviving ids append at the FIXED
    // persisted centroids, ids the batch's dedup merges retracted (a
    // longer near-dup arrived and took the canonical slot) tombstone,
    // and compaction rewrites only the touched cells — so index
    // MUTATION costs scale with the reconciled delta (the diff itself
    // reads the index + survivor ids once; a no-op derive pays that
    // comparison scan and zero writes). Correctness rides the
    // IvfIndexSpec lifecycle laws
    // (append ∘ delete ∘ compact ≡ rebuild on the surviving set at
    // fixed centroids); CorpusPipelineSpec pins live-ids ≡ survivors
    // across an append that retracts a base canonical.
    if (cfg.annIndex || cfg.knnGraph) {
      require(cfg.embeddingsPath.nonEmpty,
        "annIndex/knnGraph need embeddingsPath (a (vec_id = doc_id, embedding) parquet)")
      val sv = spark.read.parquet(cfg.embeddingsPath)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .join(survivors2.select(col("doc_id").as("vec_id")), "vec_id")
      // survivors with NO embedding row cannot serve — that is a data
      // defect, not a silent shrink of the index: census it next to the
      // other fails reports so the gap is visible
      val missing = survivors2.select(col("doc_id").as("vec_id"))
        .join(sv.select(col("vec_id")), Seq("vec_id"), "left_anti").count()
      Fs.writeString(spark, p("fails_ann.json"),
        s"""{"survivors_missing_embedding": $missing}""")
      if (cfg.annIndex)
        reconcileAnnIndex(spark, p("ann_index"), sv, cfg.annCells, cfg.annRetrainPsi)
      // the GRAPH serving arm (r16): same reconcile-by-delta contract
      // over the KnnGraph artifact — HNSW/DiskANN-shaped serving next
      // to (or instead of) the IVF arm
      if (cfg.knnGraph)
        reconcileKnnGraph(spark, p("knn_graph"), sv, cfg.knnGraphK,
          cfg.knnGraphRounds, cfg.knnGraphBeam, cfg.knnGraphHops)
    }

    // ---- leakage-aware split (≡ ml_cluster_split) ----
    // assignment is keyed on the cluster rep over the WHOLE kept corpus
    // (the fence is a property of the group, not of who survived), then
    // applied to survivors
    val split = Pipeline.stage(spark, p("split"), forceD)(
      DedupQueries.clusterSplitAssign(kept, clusters))
    val splitCensusPath = p("split_census.json")
    if (forceD || !Fs.exists(spark, splitCensusPath)) {
      val rows = DedupQueries.clusterSplitCensus(split).orderBy(col("split")).collect()
      Fs.writeString(spark, splitCensusPath,
        rows.map(r => s""""${r.getString(0)}": {"n_docs": ${r.getLong(1)}, "n_groups": ${r.getLong(2)}, "n_chars": ${r.getLong(3)}, "id_sum": ${r.getLong(4)}}""")
          .mkString("{", ", ", "}"))
    }

    // ---- tokenizer: BPE merge table trained on the shipped corpus's
    // TRAIN split only (the tokenizer is a trained artifact — letting it
    // see valid/test text is the same leak the cluster fence exists to
    // stop). Stage body IS Bpe.fit, the kernel text_bpe_merges gates.
    // Default mode: it lives in the derived tier, so append batches
    // retrain it over the merged corpus via the derived fingerprint.
    // FREEZE mode (cfg.freezeTokenizer — r15 verdict §2): the tokenizer
    // trains ONCE, on the FIRST derive's train split, and later derives
    // reuse it — the production discipline (a tokenizer is versioned
    // with the model, not the corpus snapshot), and the precondition
    // for the incremental packed tier below: retraining per append can
    // shift EVERY token id, forcing a 100% packed rewrite for a 0.1%
    // batch. Frozen mode also persists the COMPLETE id table
    // (alphabet ∪ merge outputs, fit-frequency ranked) so unseen-at-fit
    // tokens in later batches still encode deterministically.
    if (cfg.bpeMerges > 0) {
      val tokForce = if (cfg.freezeTokenizer) forceBase else forceD
      Pipeline.stage(spark, p("tokenizer"), tokForce) {
        val trainDocs = survivors2.join(
          split.where(col("split") === "train").select(col("doc_id")), "doc_id")
        import spark.implicits._
        graft.ops.Bpe.fit(trainDocs, cfg.bpeMerges)
          .map(m => (m.rank.toLong, m.left, m.right, m.left + m.right, m.count))
          .toDF("rank", "left_sym", "right_sym", "merged", "pair_count")
      }
      if (cfg.freezeTokenizer)
        Pipeline.stage(spark, p("token_ids"), force = tokForce) {
          val trainDocs = survivors2.join(
            split.where(col("split") === "train").select(col("doc_id")), "doc_id")
          graft.queries.TextQueries.bpeTokenIds(trainDocs, mergesOf(spark, outDir))
        }
    }

    // ---- packed: the TRAINING-READY deliverable (r14 verdict §1) ----
    // the artifact an LLM data pipeline exists to produce — survivors
    // tokenized through the TRAINED merge table (the text_bpe_tokenize
    // kernel) and concat-and-chunked into fixed-`packBudget` token-id
    // context windows (the ml_pack_sequences layout made real), one row
    // per sequence: the ordered token_ids array plus doc_spans
    // (doc_id, start_pos) boundary metadata for loss masking /
    // provenance. Packing is keyed by SPLIT, so no sequence ever
    // straddles the leakage fence; within a split, shard hash + doc_id
    // order make the layout deterministic and append-stable (the stage
    // recomputes in the derived tier, so run-then-append ≡ full rerun
    // extends to it). Scale: the two corpus-sized steps are the
    // tokenize equi-join and the per-shard doc cumsum (parallelism =
    // splits × epochShards, sized to the cluster); the per-sequence
    // collect is bounded by packBudget.
    val packedOpt = if (cfg.packBudget > 0) {
      require(cfg.bpeMerges > 0,
        "packBudget needs the trained tokenizer stage (set bpeMerges > 0)")
      if (cfg.freezeTokenizer)
        Some(packedFrozen(spark, outDir, cfg, survivors2, split,
          forceFull = forceBase))
      else {
        val packed = Pipeline.stage(spark, p("packed"), forceD) {
          val merges = mergesOf(spark, outDir)
          val toks = graft.queries.TextQueries.bpeTokenStream(survivors2, merges)
            .join(split.select(col("doc_id"), col("split")), "doc_id")
          packSequences(graft.queries.TextQueries
            .packTokenStream(toks, cfg.packBudget, cfg.epochShards,
              salt = "pack", keyCols = Seq("split")), Seq("split"))
        }
        val shardsPath = p("packed_shards")
        if (forceD || !Fs.exists(spark, s"$shardsPath/_SUCCESS"))
          Sinks.shardedParquet(packed, shardsPath,
            partitionCols = Seq("split"), sortCols = Seq("shard", "seq_id"),
            maxRecordsPerFile = cfg.maxRecordsPerFile)
        Some(packed)
      }
    } else None

    // ---- mixture + epoch order over the final corpus ----
    val mixture = Pipeline.stage(spark, p("mixture"), forceD)(
      MlQueries.mixtureEpochsFrame(survivors2, cfg.budgetTokens))
    if (forceD || !Fs.exists(spark, p("mixture.json"))) {
      val rows = mixture.orderBy(col("source")).collect()
      Fs.writeString(spark, p("mixture.json"),
        rows.map(r => s""""${r.getString(0)}": {"n_tokens": ${r.getLong(1)}, "share": ${r.getDouble(2)}, "epochs": ${r.getDouble(3)}}""")
          .mkString("{", ", ", "}"))
    }
    // append-STABLE visit order (≡ ml_epoch_order_stable): pos is the
    // sparse permutation key, so an appended batch never shifts an
    // existing doc's (shard, pos) — the precondition for the
    // incremental shard write below (a dense rank reshuffles ~half of
    // every shard per insert and forces a wholesale rewrite)
    val order = Pipeline.stage(spark, p("epoch_order"), forceD)(
      MlQueries.epochOrderStableFrame(survivors2, cfg.epochSeed, cfg.epochShards))

    // ---- dataset card: the release-notes sidecar composing the
    // validation gate (ml_constraint_audit's plan over the SHIPPED
    // corpus) with the per-source residual dup-rate census
    // (ml_dedup_rate_by_source's plan — post-dedup rates should be ~0;
    // a non-zero residual is the near-dup tier's exact-tier blind spot
    // made visible) and the top cross-source shingle-overlap pairs
    // (dedup_source_overlap's plan off the persisted signature table —
    // which FEEDS still duplicate each other after dedup) ----
    if (forceD || !Fs.exists(spark, p("dataset_card.json"))) {
      val cons = MlQueries.constraintAuditFrame(survivors2).orderBy(col("con"))
        .collect().map(r => s""""${r.getString(0)}": {"metric": ${r.getDouble(1)}, "pass": ${r.getBoolean(2)}}""")
      val rates = DedupQueries.dedupRateBySourceFrame(survivors2).orderBy(col("source"))
        .collect().map(r => s""""${r.getString(0)}": {"n_docs": ${r.getLong(1)}, "dup_rate": ${r.getDouble(4)}, "n_cross": ${r.getLong(5)}}""")
      val overlap = DedupQueries.sourceOverlapPairs(
          hs.join(survivors2.select(col("doc_id")), "doc_id"), survivors2)
        .orderBy(col("jaccard").desc, col("sa"), col("sb")).limit(5).collect()
        .map(r => s"""{"sa": ${graft.core.Json.quote(r.getString(0))}, "sb": ${graft.core.Json.quote(r.getString(1))}, "jaccard": ${r.getDouble(3)}}""")
      // token census of the shipped packed artifact (≤3 rows) — the
      // number a training run budgets against
      val packedJson = packedOpt.fold("") { pk =>
        val rows = pk.groupBy(col("split"))
          .agg(count(lit(1)).as("n_sequences"), sum(col("n_tokens")).as("n_tokens"))
          .orderBy(col("split")).collect()
          .map(r => s""""${r.getString(0)}": {"n_sequences": ${r.getLong(1)}, "n_tokens": ${r.getLong(2)}}""")
        s""", "packed_tokens": ${rows.mkString("{", ", ", "}")}"""
      }
      Fs.writeString(spark, p("dataset_card.json"),
        s"""{"constraints": ${cons.mkString("{", ", ", "}")}, "dup_rate_by_source": ${rates.mkString("{", ", ", "}")}, "top_source_overlap": ${overlap.mkString("[", ", ", "]")}$packedJson}""")
    }

    // ---- final corpus + sharded training layout ----
    val corpus = Pipeline.stage(spark, p("corpus"), forceD)(
      survivors2
        .join(split.select(col("doc_id"), col("split")), "doc_id")
        .join(order, "doc_id"))
    val shardsPath = p("shards")
    if (forceD || !Fs.exists(spark, s"$shardsPath/_SUCCESS")) {
      // INCREMENTAL on re-derives: only (split, source) partitions whose
      // content changed rewrite (the id-sized diff inside the sink);
      // correct because every non-projected column is doc_id-determined
      // and the visit order above is append-stable. First derive falls
      // back to the full writer.
      val tS = System.nanoTime()
      val touched = Sinks.shardedParquetIncremental(corpus, shardsPath,
        partitionCols = Seq("split", "source"), sortCols = Seq("shard", "pos"),
        keyCol = "doc_id", maxRecordsPerFile = cfg.maxRecordsPerFile)
      if (spark.conf.get("spark.graft.ann.log", "false").toBoolean)
        System.err.println(f"[shards.incremental] partitions_rewritten=$touched " +
          f"wall=${(System.nanoTime() - tS) / 1e9}%.2f s")
    }

    val splitCounts = split.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (splitCounts, survivors2.count(), canonical.count())
  }

  private def mergesOf(spark: SparkSession, outDir: String): Seq[graft.ops.Bpe.Merge] =
    spark.read.parquet(s"$outDir/tokenizer").orderBy(col("rank"))
      .collect().map(r => graft.ops.Bpe.Merge(
        r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(4)))
      .toSeq // merges+alphabet sized — the artifact IS driver data

  /** Collapse packed token coordinates into one row per sequence:
    * ordered token_ids + doc_spans boundary metadata + token census.
    * `keyCols` is the packing fence (split; split+source in frozen
    * mode) — the per-sequence collect is bounded by the pack budget.
    */
  private def packSequences(coords: DataFrame, keyCols: Seq[String]): DataFrame = {
    val keys = keyCols.map(col)
    coords
      .groupBy(keys ++ Seq(col("shard"), col("seq_id")): _*)
      .agg(array_sort(collect_list(struct(col("pos"), col("tid"), col("doc_id"))))
        .as("ord"))
      .select(keys ++ Seq(col("shard"), col("seq_id"),
        expr("transform(ord, x -> x.tid)").as("token_ids"),
        expr("""transform(
                  filter(sequence(0, size(ord) - 1),
                         i -> i = 0 OR ord[i].doc_id != ord[i - 1].doc_id),
                  i -> struct(ord[i].doc_id AS doc_id, ord[i].pos AS start_pos))""")
          .as("doc_spans"),
        size(col("ord")).cast("long").as("n_tokens")): _*)
  }

  /** The APPEND-STABLE packed tier (freeze mode — r15 verdict §2: with
    * the tokenizer retrained per append, every token id can shift and
    * the entire packed artifact re-materializes for a 0.1% batch).
    * With merges AND token ids frozen, a doc's token stream is a pure
    * function of its own text, and packing is fenced by
    * (split, source), so a partition's sequences depend ONLY on its
    * own doc membership. The derive therefore:
    *
    *  1. diffs CURRENT (split, source, doc_id) membership against the
    *     persisted layout's doc_spans (an id-sized read — no text),
    *  2. re-tokenizes and re-packs ONLY the changed partitions' docs —
    *     the corpus-sized tokenize is paid ∝ batch-touched partitions,
    *  3. patches exactly those partitions in place
    *     ([[Sinks.shardedParquetPatch]]; crash mid-patch → the retired
    *     _SUCCESS routes the next derive to the full writer).
    *
    * Law (CorpusPipelineSpec): run(base) + append(batch) ≡ a full
    * frozen-tokenizer pack of the merged survivors through the
    * BASE-trained merges+ids; untouched partitions stay byte-stable.
    */
  private def packedFrozen(spark: SparkSession, outDir: String,
                           cfg: CorpusConfig, survivors2: DataFrame,
                           split: DataFrame, forceFull: Boolean): DataFrame = {
    def p(name: String) = s"$outDir/$name"
    val shardsPath = p("packed_shards")
    val merges = mergesOf(spark, outDir)
    val ids = spark.read.parquet(p("token_ids"))
    val member = survivors2.select(col("doc_id"), col("source"))
      .join(split.select(col("doc_id"), col("split")), "doc_id")
    def packOf(docs: DataFrame): DataFrame = {
      val toks = graft.queries.TextQueries
        .bpeTokenStreamWithIds(docs, merges, ids)
        .join(member, "doc_id")
      packSequences(graft.queries.TextQueries.packTokenStream(
        toks, cfg.packBudget, cfg.epochShards, salt = "pack",
        keyCols = Seq("split", "source")), Seq("split", "source"))
    }
    def pcolS(c: Column) = nullif(c.cast("string"), lit(""))
    // forceFull: a config change re-shapes every sequence (budget,
    // shards, merges all changed under us) — the membership diff is
    // blind to that, so route to the full writer
    val prevOpt = if (forceFull || !Fs.exists(spark, s"$shardsPath/_SUCCESS")) None else
      try {
        val prev = spark.read.parquet(shardsPath)
          .select(pcolS(col("split")).as("split"),
            pcolS(col("source")).as("source"),
            explode(expr("transform(doc_spans, x -> x.doc_id)")).as("doc_id"))
          .distinct()
        prev.queryExecution.analyzed // force resolution inside the try
        Some(prev)
      } catch {
        // committed-but-file-less layout: nothing to diff against
        case _: org.apache.spark.sql.AnalysisException => None
      }
    prevOpt match {
      case None =>
        Sinks.shardedParquet(packOf(survivors2), shardsPath,
          partitionCols = Seq("split", "source"),
          sortCols = Seq("shard", "seq_id"),
          maxRecordsPerFile = cfg.maxRecordsPerFile)
      case Some(prev) =>
        val cur = member.select(pcolS(col("split")).as("split"),
          pcolS(col("source")).as("source"), col("doc_id"))
        val delta = cur.withColumn("__side", lit(1L))
          .unionByName(prev.withColumn("__side", lit(-1L)))
          .groupBy(col("split"), col("source"), col("doc_id"))
          .agg(sum(col("__side")).as("__d")).where(col("__d") =!= 0L)
        val changed: Seq[Seq[Option[String]]] = delta
          .select(col("split"), col("source")).distinct().collect()
          .map(r => Seq(Option(r.getString(0)), Option(r.getString(1))): Seq[Option[String]])
          .toSeq
        if (changed.nonEmpty) {
          def pred(vals: Seq[Option[String]]) =
            Seq("split", "source").zip(vals).map { case (c, v) =>
              v.fold(pcolS(col(c)).isNull)(x => pcolS(col(c)) === x)
            }.reduce(_ && _)
          val docsChanged = survivors2.join(
            member.where(changed.map(pred).reduce(_ || _))
              .select(col("doc_id")), "doc_id")
          val tS = System.nanoTime()
          val touched = Sinks.shardedParquetPatch(packOf(docsChanged),
            shardsPath, Seq("split", "source"), Seq("shard", "seq_id"),
            changed, cfg.maxRecordsPerFile)
          if (spark.conf.get("spark.graft.ann.log", "false").toBoolean)
            System.err.println(f"[packed.incremental] partitions_rewritten=$touched " +
              f"wall=${(System.nanoTime() - tS) / 1e9}%.2f s")
        }
    }
    spark.read.parquet(shardsPath)
  }

  /** Rederive-and-report over the CURRENT committed state (base + all
    * applied batches): recompute the derived tier iff the derived
    * fingerprint doesn't match the applied-batch list, then assemble the
    * merged CorpusResult.
    */
  /** Reconcile the persisted IVF index at `root` to hold EXACTLY the
    * ids of `sv` (vec_id, v). First touch builds; later calls diff the
    * live set against sv (one index read + one sv pass — the comparison
    * is what a reconcile IS), then mutate by DELTA. If any target id is
    * currently TOMBSTONED (it was retracted and has re-survived —
    * cluster membership can flip back under the semantic tier's
    * data-dependent k), the shadowing tombstone ROWS are drained FIRST
    * via compact's dropIds mode — one crash-atomic rewrite of the tiny
    * tombstone table, zero cell rewrites (r13 advice asked for a
    * cell-scoped drain; dropping just the tombstones is strictly
    * cheaper AND reaches the orphan case a cell scope cannot): celled
    * re-survivors resurrect their existing rows, orphans stop
    * shadowing the re-append. Without the drain, an append shadowed by
    * a live tombstone would never serve and every later derive would
    * append another invisible duplicate — the re-survival divergence
    * CorpusPipelineSpec pins.
    * All mutations are skipped when their delta is empty, so a no-op
    * derive pays zero writes and no compaction stats scan. An EMPTY
    * target set before the first build (zero survivors, or an
    * embeddings parquet matching none — already censused in
    * fails_ann.json) skips the build rather than fitting a quantizer on
    * nothing (r13 advice); the first non-empty derive builds.
    */
  private[graft] def reconcileAnnIndex(spark: SparkSession, root: String,
                                       sv: DataFrame, cells: Int,
                                       retrainPsi: Double = 0.0): Unit = {
    // per-stage walls (spark.graft.ann.log — ScaleProbe's annpipe leg
    // reads these to split the add-on into build / drain / diff /
    // append / retract, the delta-sized-mutation evidence)
    val logOn = spark.conf.get("spark.graft.ann.log", "false").toBoolean
    var t = System.nanoTime()
    def lap(tag: String): Unit = if (logOn) {
      System.err.println(f"[ann.reconcile] $tag ${(System.nanoTime() - t) / 1e9}%.2f s")
      t = System.nanoTime()
    }
    // finish (or discard) a retrain swap an earlier derive crashed in —
    // before ANY read of the root, so readers never see the gap
    adoptRetrain(spark, root)
    if (!Fs.exists(spark, s"$root/centroids")) {
      if (sv.head(1).nonEmpty) {
        IvfIndex.build(sv, cells, iters = 2, root)
        // the drift baseline is the census AT FIT TIME — write it with
        // the build, not lazily at the first reconcile (which would
        // silently forgive any drift accumulated in between)
        if (retrainPsi > 0) retrainIfDrifted(spark, root, sv, cells, retrainPsi)
      }
      lap("build")
      return
    }
    // SELF-HEAL first (r13 verdict §1's repair, wired into the one
    // place that owns this index): a compaction that crashed in an
    // earlier derive leaves readers on the list-and-filter path —
    // repair reconciles intents, deletes retired files and certifies
    // CLEAN before this derive's reads. No-op (one listing) on a
    // healthy root; single-writer holds because the derive IS the
    // index's only writer.
    IvfIndex.repair(spark, root)
    lap("repair")
    val resIds = sv.select(col("vec_id"))
      .join(IvfIndex.tombstones(spark, root), "vec_id").transform(Ckpt.eager)
    if (resIds.head(1).nonEmpty) {
      // drain ONLY the shadowing tombstone rows (compact's dropIds —
      // one crash-atomic rewrite of the tiny tombstone table, zero cell
      // rewrites): a celled re-survivor RESURRECTS its existing row
      // (vectors are vec_id-keyed and immutable, so the row is the one
      // sv would re-append), and an ORPHAN tombstone (id an earlier
      // compaction physically removed — the r14 review's case, which a
      // cell-scoped drain could never reach) stops shadowing the
      // re-append the diff below will issue
      IvfIndex.compact(spark, root, minRatio = 2.0, onlyCells = Seq.empty,
        dropIds = resIds): Unit
    }
    lap("drain")
    // materialize BOTH deltas BEFORE mutating the files they were
    // computed from (the compactPlan discipline)
    val have = IvfIndex.liveAssignments(spark, root).select(col("vec_id"))
    val add = sv.join(have, Seq("vec_id"), "left_anti").transform(Ckpt.eager)
    val gone = have.join(sv.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .transform(Ckpt.eager)
    lap("diff")
    if (add.head(1).nonEmpty) IvfIndex.append(spark, add, root)
    lap("append")
    if (gone.head(1).nonEmpty) {
      IvfIndex.delete(spark, gone, root)
      IvfIndex.compact(spark, root, minRatio = 0.1): Unit
    }
    lap("retract")
    if (retrainPsi > 0) {
      retrainIfDrifted(spark, root, sv, cells, retrainPsi)
      lap("drift")
    }
  }

  /** Graph-arm twin of [[reconcileAnnIndex]]: keep the persisted
    * [[graft.ops.KnnGraph]] artifact serving EXACTLY the ids of `sv`.
    * First non-empty derive BUILDS (NN-Descent over the survivor
    * vectors); later derives mutate by DELTA — re-surviving tombstoned
    * ids drain their shadowing tombstone rows FIRST (resurrecting the
    * still-present vertex and its edges; the same shadow-vs-duplicate
    * divergence the IVF arm's drain prevents), newly-surviving ids
    * INSERT by beam search over the existing graph (cost ∝ batch, no
    * base re-scoring), retracted ids tombstone and the artifact
    * consolidates (the edge half is metadata-sized, so the eager
    * consolidation is cheap; it keeps holes repaired and tombstones
    * drained for the serving tier). KnnGraph.heal runs before any
    * read, so a derive that crashed mid-compact never strands readers.
    */
  private[graft] def reconcileKnnGraph(spark: SparkSession, root: String,
                                       sv: DataFrame, k: Int, rounds: Int,
                                       beam: Int, hops: Int): Unit = {
    import graft.ops.KnnGraph
    val logOn = spark.conf.get("spark.graft.ann.log", "false").toBoolean
    var t = System.nanoTime()
    def lap(tag: String): Unit = if (logOn) {
      System.err.println(f"[knng.reconcile] $tag ${(System.nanoTime() - t) / 1e9}%.2f s")
      t = System.nanoTime()
    }
    KnnGraph.heal(spark, root)
    if (!Fs.exists(spark, s"$root/meta.json")) {
      // an EMPTY target before the first build: skip rather than
      // persist a graph over nothing (the IVF arm's r13 rule)
      if (sv.head(1).nonEmpty) KnnGraph.build(sv, k, rounds, root)
      lap("build")
      return
    }
    // empty→non-empty transition (r16 review): after survivors dropped
    // to zero, delete+compact left an EDGELESS-but-complete artifact —
    // inserting into it would beam-search an empty graph and append the
    // whole batch with ZERO edges, permanently. A repopulating derive
    // REBUILDS instead (build retires the meta marker first, so a crash
    // mid-rebuild reads as incomplete, and drops stale tombstones).
    if (KnnGraph.liveVertices(spark, root).head(1).isEmpty) {
      if (sv.head(1).nonEmpty) KnnGraph.build(sv, k, rounds, root)
      lap("rebuild_from_empty")
      return
    }
    val resIds = sv.select(col("vec_id"))
      .join(KnnGraph.tombstones(spark, root), "vec_id").transform(Ckpt.eager)
    if (resIds.head(1).nonEmpty) KnnGraph.dropTombstones(spark, resIds, root)
    lap("drain")
    // materialize BOTH deltas BEFORE mutating the files they were
    // computed from (the compactPlan discipline)
    val have = KnnGraph.liveVertices(spark, root).select(col("vec_id"))
    val add = sv.join(have, Seq("vec_id"), "left_anti").transform(Ckpt.eager)
    val gone = have.join(sv.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .transform(Ckpt.eager)
    lap("diff")
    if (add.head(1).nonEmpty) KnnGraph.append(spark, add, root, beam, hops)
    lap("insert")
    if (gone.head(1).nonEmpty) {
      KnnGraph.delete(spark, gone, root)
      KnnGraph.compact(spark, root)
    }
    lap("retract")
  }

  /** The RETRAIN TRIGGER, acted on (r13's coverage note left it
    * surfaced-only via embed_index_drift's PSI row): appends assign at
    * FIXED centroids, so a corpus whose embedding distribution drifts
    * accumulates ever-worse cells — the quantizer must eventually
    * refit. The baseline is the cell census persisted at the LAST fit
    * (`root/census`, ≤cells rows); after each reconcile's mutations the
    * live census compares by population-stability index (the
    * embed_index_drift statistic: Σ (q−p)·ln(q/p) over cell shares,
    * 1e-6 floor), and a crossing rebuilds the WHOLE artifact over the
    * reconciled survivor set — centroids, assignments, and a fresh
    * census baseline; stale tombstones/manifest state die with the old
    * root (a rebuilt index starts CLEAN). Pre-census indexes (built
    * before this feature) adopt the current census as baseline and
    * skip the check once. The industry-standard 0.2 "significant
    * shift" threshold is a reasonable config value.
    */
  private def retrainIfDrifted(spark: SparkSession, root: String,
                               sv: DataFrame, cells: Int, thr: Double): Unit = {
    def liveCensus(r: String = root): Map[Long, Long] =
      IvfIndex.liveAssignments(spark, r).groupBy(col("cl")).count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def writeCensus(c: Map[Long, Long], r: String = root): Unit = {
      import spark.implicits._
      c.toSeq.toDF("cl", "n").coalesce(1)
        .write.mode("overwrite").parquet(s"$r/census")
    }
    if (!Fs.exists(spark, s"$root/census")) { writeCensus(liveCensus()); return }
    val base = spark.read.parquet(s"$root/census")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cur = liveCensus()
    val bT = math.max(base.values.sum.toDouble, 1.0)
    val cT = math.max(cur.values.sum.toDouble, 1.0)
    val psi = (base.keySet ++ cur.keySet).toSeq.map { c =>
      val p = math.max(base.getOrElse(c, 0L) / bT, 1e-6)
      val q = math.max(cur.getOrElse(c, 0L) / cT, 1e-6)
      (q - p) * math.log(q / p)
    }.sum
    // an EMPTY target must never trigger a destructive rebuild (its
    // census is all-zero, so PSI is maximal by construction): the index
    // already serves nothing after the retractions above, and deleting
    // the root to fit a quantizer on zero rows would leave an
    // unreadable artifact (r14 review)
    if (psi > thr && sv.head(1).nonEmpty) {
      // WRITE-ASIDE + SWAP (r14 advice): the rebuild was the lifecycle's
      // one non-crash-atomic destructive mutation — delete-then-build
      // left a window where readers saw NO index. Now the whole refit
      // lands under a sibling temp root (census written LAST = the
      // completeness marker), and only then does the old root retire.
      // The swap itself retires the old root by RENAME rather than
      // delete (r15 advice): rename(root→.old) + rename(tmp→root) +
      // delete(.old) keeps a readable root alive at every instant
      // except the two-rename gap — and a concurrent out-of-pipeline
      // reader that loses that race merely retries, rather than facing
      // a root that stays missing until the next derive heals it. A
      // crash anywhere in the sequence is healed by [[adoptRetrain]]
      // at the next derive's entry (the completed write-aside is
      // adopted, not rebuilt; a half-swapped .old is finished or
      // restored).
      val tmp = retrainTmp(root)
      val old = retrainOld(root)
      Fs.deleteRecursive(spark, tmp)
      IvfIndex.build(sv, cells, iters = 2, tmp)
      writeCensus(liveCensus(tmp), tmp)
      Fs.deleteRecursive(spark, old)
      Fs.rename(spark, root, old)
      Fs.rename(spark, tmp, root)
      Fs.deleteRecursive(spark, old)
    }
  }

  private def retrainTmp(root: String): String = s"$root.retrain"
  private def retrainOld(root: String): String = s"$root.old"

  /** Crash recovery for the retrain swap, run before any index read: a
    * COMPLETE write-aside (its census marker present) whose swap didn't
    * finish is adopted — resume the retire-rename sequence exactly
    * where the crashed writer stopped; an incomplete one (no census) is
    * debris from a crash mid-refit and is discarded, the still-live old
    * root having served throughout. A `.old` root left by a crash
    * between the swap's renames is finished (new root adopted, .old
    * deleted) or — defensively, with neither tmp nor root present —
    * restored. Single-writer (the derive) holds, same as
    * compact/repair.
    */
  private def adoptRetrain(spark: SparkSession, root: String): Unit = {
    val tmp = retrainTmp(root)
    val old = retrainOld(root)
    // the marker is the census write's JOB COMMIT (_SUCCESS), not the
    // directory: a crash DURING the census write leaves $tmp/census
    // with only _temporary debris, and adopting that would destroy the
    // still-healthy live root for a write-aside whose drift baseline is
    // unreadable (r15 review)
    if (Fs.exists(spark, s"$tmp/census/_SUCCESS")) {
      // resume: retire the live root (if the crash came before its
      // rename), adopt the write-aside, drop the retired copy
      if (Fs.exists(spark, root)) {
        Fs.deleteRecursive(spark, old)
        Fs.rename(spark, root, old)
      }
      Fs.rename(spark, tmp, root)
      Fs.deleteRecursive(spark, old)
    } else {
      if (Fs.exists(spark, tmp)) Fs.deleteRecursive(spark, tmp)
      if (Fs.exists(spark, old)) {
        // tmp gone + .old present: crash after rename(tmp→root) but
        // before the .old delete — root IS the new index, .old is
        // debris. If root is somehow missing too, restore the retired
        // copy rather than leave no index at all.
        if (Fs.exists(spark, root)) Fs.deleteRecursive(spark, old)
        else Fs.rename(spark, old, root)
      }
    }
  }

  private def mergedResult(spark: SparkSession, outDir: String, cfg: CorpusConfig,
                           fingerprint: String): CorpusResult = {
    def p(name: String) = s"$outDir/$name"
    val tags = appliedBatches(spark, outDir).map(_._1)
    val want = derivedFpOf(fingerprint, tags)
    val dfpPath = p("derived.fingerprint")
    val forceD = !Fs.exists(spark, dfpPath) || Fs.readString(spark, dfpPath) != want
    val docs = mergedStage(spark, outDir, "docs", tags)
    val kept = mergedStage(spark, outDir, "kept", tags)
    val hs = mergedStage(spark, outDir, "signatures", tags)
    // incremental cluster maintenance: merge every committed batch's
    // pair delta into the PERSISTED cluster map (localCheckpoint first
    // — the stage will overwrite the path it was read from).
    // mergeBatch is idempotent for already-merged edges, so replaying
    // ALL deltas is crash-safe regardless of which rederive last
    // committed; with no batches this is the base map unchanged.
    def clusters0: DataFrame =
      if (tags.isEmpty) spark.read.parquet(s"$outDir/clusters")
      else {
        val prior = spark.read.parquet(s"$outDir/clusters").transform(graft.ops.Ckpt.eager)
        val deltas = tags.map(t => spark.read.parquet(s"${batchDir(outDir, t)}/pairs"))
          .reduce(_.unionByName(_))
          .where(col("sim") >= cfg.tau).select(col("i"), col("j"))
        graft.ops.Components.mergeBatch(prior, deltas)
      }
    if (forceD) Fs.delete(spark, dfpPath)
    val (splitCounts, nSurv, nClus) = deriveTier(spark, outDir, cfg, kept, hs,
      clusters0, forceD, forceBase = false)
    Fs.writeString(spark, dfpPath, want)
    val nRaw = (s"$outDir" +: tags.map(batchDir(outDir, _)))
      .map(d => Fs.readString(spark, s"$d/raw_count").trim.toLong).sum
    CorpusResult(nRaw = nRaw, nDocs = docs.count(), nKept = kept.count(),
      nSurvivors = nSurv, nClusters = nClus, splitCounts = splitCounts)
  }

  // ---------------- batch build ----------------

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
      (if (Fs.exists(spark, cfgPath))
         Fs.readString(spark, cfgPath) != fingerprint
       else Fs.exists(spark, p("docs")))
    if (force0) Fs.delete(spark, cfgPath)

    // committed appends are part of this outDir's state: an unforced
    // re-run serves the MERGED corpus (idempotent ensure); a forced run
    // clears them — batch deltas were built against the old base
    val applied = appliedBatches(spark, outDir)
    if (applied.nonEmpty) {
      if (force0) {
        Fs.delete(spark, appendsPath(outDir))
        Fs.deleteRecursive(spark, s"$outDir/batches")
      } else return mergedResult(spark, outDir, cfg, fingerprint)
    }

    // ---- ingest (F4: corrupt lines quarantined, not fatal) ----
    val (docs, nRawCount) = ingestStages(spark, jsonlPath, outDir, force0)

    // ---- quality funnel (≡ ml_quality_funnel) ----
    val funnel = Pipeline.stage(spark, p("funnel"), force0)(
      MlQueries.qualityFunnelFlags(docs))
    val kept = Pipeline.stage(spark, p("kept"), force0)(
      docs.join(funnel.where(col("keep") === 1).select(col("doc_id")), "doc_id"))
    if (force0 || !Fs.exists(spark, p("fails_kept.json")))
      Sinks.failsReport(docs, kept, "doc_id", p("fails_kept.json"))

    // ---- persisted dedup state: digest + signature tables ----
    // digests: the exact-tier state append batches check against.
    // signatures: the per-snapshot signature table every dedup pass
    // (and every future append) reuses — built ONCE per doc, never
    // re-shingled
    val digests = Pipeline.stage(spark, p("digests"), force0)(
      docs.select(col("doc_id"), md5(col("text")).as("dg")))
    locally { val _ = digests } // materialized for append; unused here
    val hs = Pipeline.stage(spark, p("signatures"), force0)(
      DedupQueries.hashesOfDocs(spark, kept))
    val pairs = Pipeline.stage(spark, p("pairs"), force0)(
      DedupQueries.minhashVerifiedPairs(hs, cfg.tau))

    // ---- derived tier (shared with append) ----
    val want = derivedFpOf(fingerprint, Seq.empty)
    val dfpPath = p("derived.fingerprint")
    val forceD = force0 ||
      !Fs.exists(spark, dfpPath) || Fs.readString(spark, dfpPath) != want
    if (forceD) Fs.delete(spark, dfpPath)
    def clusters0: DataFrame =
      graft.ops.Components.connectedComponents(
          pairs.where(col("sim") >= cfg.tau).select(col("i"), col("j")))
        .select(col("node"), col("rep"))
    val (splitCounts, nSurv, nClus) = deriveTier(spark, outDir, cfg, kept, hs,
      clusters0, forceD, forceBase = force0)
    Fs.writeString(spark, dfpPath, want)

    graft.core.Fs.writeString(spark, cfgPath, fingerprint)

    CorpusResult(
      nRaw = nRawCount,
      nDocs = docs.count(), nKept = kept.count(),
      nSurvivors = nSurv, nClusters = nClus,
      splitCounts = splitCounts)
  }

  /** INCREMENTAL append — merge a new JSONL batch into a completed
    * corpus outDir without recomputing the corpus: batch-scaled delta
    * stages (ingest → incremental funnel → signatures → incremental
    * pair build against the persisted signature table) land under
    * `batches/<tag>/`, the batch commits atomically to `appends.tsv`,
    * and the id-sized derived tier recomputes over the merged views.
    * Result ≡ a full [[run]] over base ∪ batch (CorpusPipelineSpec).
    *
    * Idempotent and resumable: delta stages use the same target-exists
    * skip as everything else; an already-committed batch short-circuits
    * to the merged report. Precondition (checked): every batch doc_id
    * strictly exceeds every committed doc_id.
    */
  def append(spark: SparkSession, batchJsonlPath: String, outDir: String,
             cfg: CorpusConfig = CorpusConfig(), force: Boolean = false): CorpusResult = {
    TextOps.ensureFunctions(spark)
    val cfgPath = s"$outDir/config.fingerprint"
    require(Fs.exists(spark, cfgPath),
      s"append: no completed base run in $outDir (missing config.fingerprint)")
    val fingerprint = Fs.readString(spark, cfgPath)
    require(fingerprint.startsWith("(" + cfg.toString + ","),
      "append: CorpusConfig differs from the base run's — append would mix " +
        "thresholds; re-run the base with the new config instead")

    val tag = batchTag(batchJsonlPath)
    val applied = appliedBatches(spark, outDir)
    if (!applied.exists(_._1 == tag)) {
      val bdir = batchDir(outDir, tag)
      new java.io.File(bdir).mkdirs()
      val priorTags = applied.map(_._1)

      val (bdocs, _) = ingestStages(spark, batchJsonlPath, bdir, force)

      // id monotonicity: keep-first exact dedup, lower-id pair order and
      // CC reps are only composition-stable when new ids sort after ALL
      // prior ids (the production dense-ids-at-ingest discipline)
      val priorDocs = mergedStage(spark, outDir, "docs", priorTags)
      val maxPrior = priorDocs.agg(max(col("doc_id"))).head().getLong(0)
      val minBatch = bdocs.agg(min(col("doc_id"))).head() match {
        case r if r.isNullAt(0) =>
          throw new IllegalArgumentException(s"append: batch $batchJsonlPath parsed no docs")
        case r => r.getLong(0)
      }
      require(minBatch > maxPrior,
        s"append: batch doc_ids must exceed all prior ids (batch min $minBatch <= prior max $maxPrior)")

      val priorDigests = mergedStage(spark, outDir, "digests", priorTags)
      val bfunnel = Pipeline.stage(spark, s"$bdir/funnel", force)(
        MlQueries.qualityFunnelFlagsIncremental(bdocs, priorDigests))
      val bkept = Pipeline.stage(spark, s"$bdir/kept", force)(
        bdocs.join(bfunnel.where(col("keep") === 1).select(col("doc_id")), "doc_id"))
      if (force || !Fs.exists(spark, s"$bdir/fails_kept.json"))
        Sinks.failsReport(bdocs, bkept, "doc_id", s"$bdir/fails_kept.json")
      val bdigests = Pipeline.stage(spark, s"$bdir/digests", force)(
        bdocs.select(col("doc_id"), md5(col("text")).as("dg")))
      locally { val _ = bdigests } // delta state for the NEXT append

      // batch signatures (the only new text work) + incremental pairs:
      // corpus side reads the PERSISTED signature table — band keys are
      // a map over it, candidates are keyed by the batch's band rows
      val bhs = Pipeline.stage(spark, s"$bdir/signatures", force)(
        DedupQueries.hashesOfDocs(spark, bkept))
      val priorHs = mergedStage(spark, outDir, "signatures", priorTags)
      Pipeline.stage(spark, s"$bdir/pairs", force)(
        DedupQueries.minhashVerifiedPairsIncremental(
          priorHs.unionByName(bhs), bhs, cfg.tau)): Unit

      commitBatch(spark, outDir, tag, batchJsonlPath)
    }
    mergedResult(spark, outDir, cfg, fingerprint)
  }
}
