package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Fs

/** PERSISTED k-NN graph index — the graph tier's lifecycle artifact
  * (r15 verdict #1: the NN-Descent construction and the beam search
  * were gate queries only; the graph REBUILT inside every search).
  * This is the serving shape HNSW/DiskANN deployments run: build once,
  * answer queries by beam search over the stored neighborhood graph,
  * insert/delete by delta, consolidate occasionally.
  *
  * Storage model: an EDGE LOG plus a top-k VIEW, the same
  * append-only-halves discipline as [[IvfIndex]]:
  *
  *   root/vertices/     (vec_id, v)   — parquet, append-mode
  *   root/edges/        (src, dst, d) — parquet, append-mode CANDIDATE
  *                      log: build writes the NN-Descent top-k,
  *                      appends add delta candidates, nothing ever
  *                      rewrites in place
  *   root/tombstones/   (vec_id)      — retracted ids, one tiny append
  *                      per delete ([[IvfIndex.delete]]'s shape)
  *   root/meta.json     {"k": k}      — written LAST at build/compact
  *                      (the completeness marker)
  *
  * The LIVE GRAPH ([[liveGraph]]) is defined algebraically over the
  * log: drop edges touching a tombstoned endpoint, dedup (src, dst)
  * (appends are therefore idempotent at the view level — a retried
  * half-crashed append changes nothing), then keep each source's k
  * best by (d, dst). Two properties fall out for free: a delete needs
  * NO graph surgery (the view re-ranks, and candidates that lost an
  * earlier top-k race act as BACKUP LINKS — the role FreshDiskANN's
  * consolidation reconstructs by hand), and every mutation is one
  * bounded parquet append, crash-atomic at the job-commit level.
  *
  * Scale shape: the edge log holds n·k + O(appended · (k + beam))
  * rows of (long, long, double) — METADATA-sized next to the vectors,
  * let alone the corpus. The top-k view is one window partitioned by
  * src over that log. Search cost is queries × hops × beam edge
  * lookups — independent of corpus size, the property that makes
  * graph indexes the serving tier of choice. Inserts pay beam search
  * plus ≤ batch·k² shared-neighbor pairs: delta-sized, no base
  * re-scoring. Compaction is the one whole-artifact rewrite
  * (edges are tiny; vertices are the real bytes) — rare, deferred,
  * and crash-atomic via write-aside + rename swap.
  *
  * Determinism contract (what makes every stage oracle-replayable,
  * the QueryDef discipline): distances are exact squared L2 rounded
  * to 6, every top-k tiebreaks by (d, id), the search entry point is
  * the minimum eligible vec_id, and construction is
  * [[construct]] — LSH-ring init + NN-Descent local-join rounds
  * (Dong, Moses & Li 2011), the SAME kernel the embed_knn_graph gate
  * certifies edge-for-edge.
  */
object KnnGraph {

  // ---- shared construction kernel (moved from EmbedQueries r16) ----

  /** Deterministic NN-Descent: sign-LSH ring init (each vector's
    * initial candidates are the next k ids in its LSH bucket, ring
    * order — deterministic where the paper's random init is not);
    * each round then applies the paper's local-join: candidates =
    * current neighbors ∪ reverse neighbors ∪ neighbors-of-both,
    * scored by exact round-6 squared L2, keep the best `k` per vertex
    * by (d, dst). Everything is an equi-join: the undirected edge
    * list has ≤ 2nk rows and the neighbor-of-neighbor join emits
    * ≤ n·(2k)² candidate pairs — per-round cost Θ(n·k²) with NO
    * all-pairs term (ScaleProbe's knn_graph leg measures it). Rounds
    * are Ckpt.eager'd (iterative lineage truncation, the Components
    * discipline); per-round intermediates unpersist when superseded.
    */
  def construct(v0: DataFrame, k: Int, rounds: Int): DataFrame = {
    val v = v0.select(col("vec_id"), col("v"))
    val wb = Window.partitionBy(col("bucket")).orderBy(col("vec_id"))
    val ranked = v.withColumn("bucket", Similarity.signBucket("v"))
      .select(col("vec_id"), col("bucket"))
      .withColumn("r", (row_number().over(wb) - 1).cast("long"))
      .withColumn("cnt",
        count(lit(1)).over(Window.partitionBy(col("bucket"))).cast("long"))
    val e0 = ranked
      .withColumn("j", explode(expr(s"sequence(1L, ${k}L)")))
      .where(col("j") <= col("cnt") - 1)
      .withColumn("dr", (col("r") + col("j")) % col("cnt"))
      .select(col("vec_id").as("src"), col("bucket"), col("dr"))
      .join(ranked.select(col("bucket"), col("r").as("dr"), col("vec_id").as("dst")),
        Seq("bucket", "dr"))
      .select(col("src"), col("dst"))
    val ws = Window.partitionBy(col("src")).orderBy(col("d"), col("dst"))
    def bestK(edges: DataFrame): DataFrame =
      edges.join(v.select(col("vec_id").as("src"), col("v").as("av")), "src")
        .join(v.select(col("vec_id").as("dst"), col("v").as("bv")), "dst")
        .withColumn("d", sqDist("av", "bv"))
        .withColumn("rnk", row_number().over(ws).cast("long"))
        .where(col("rnk") <= k)
        .select(col("src"), col("dst"), col("d"), col("rnk"))
    var e = e0
    // lazy init-recall arm: replaced unevaluated when rounds > 0
    var out: DataFrame = bestK(e0)
    for (_ <- 1 to rounds) {
      val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().transform(Ckpt.eager)
      // previous round's checkpointed top-k fed only `und`, which is
      // now materialized — release its blocks (the Components
      // discipline; round 1's `out` is the unevaluated init arm, a
      // no-op unpersist)
      out.unpersist()
      val cand = und.union(
          und.as("a").join(und.as("b"), col("a.dst") === col("b.src"))
            .select(col("a.src").as("src"), col("b.dst").as("dst"))
            .where(col("src") =!= col("dst")))
        .distinct()
      out = bestK(cand).transform(Ckpt.eager)
      und.unpersist() // superseded once the new top-k materialized
      e = out.select(col("src"), col("dst"))
    }
    out
  }

  /** Exact squared L2 rounded to 6 — the scoring metric every stage of
    * the graph tier shares (and the oracles replay as a DuckDB
    * list_sum fold).
    */
  private def sqDist(a: String, b: String): Column =
    round(greatest(
      Similarity.dot(a, a) + Similarity.dot(b, b)
        - lit(2.0) * Similarity.dot(a, b), lit(0.0)), 6)

  // ---- layout + small-file plumbing ----

  private def hfs(s: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(s.sparkContext.hadoopConfiguration), p)
  }

  private def writeMeta(s: SparkSession, root: String, k: Int): Unit =
    Fs.writeString(s, s"$root/meta.json", s"""{"k": $k}""")

  /** Neighbor-list width the artifact was built with (from the meta
    * marker — its presence IS build/compact completeness).
    */
  def metaK(s: SparkSession, root: String): Int = {
    val txt = Fs.readString(s, s"$root/meta.json")
    "\\d+".r.findFirstIn(txt).get.toInt
  }

  private def emptyIds(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("vec_id", org.apache.spark.sql.types.LongType))

  def tombstones(s: SparkSession, root: String): DataFrame = {
    val (fs, p) = hfs(s, s"$root/tombstones")
    if (fs.exists(p)) s.read.parquet(s"$root/tombstones").select(col("vec_id"))
    else emptyIds(s)
  }

  /** Raw vertex half (the log may carry duplicate vec_ids after a
    * retried half-crashed append — reads dedup).
    */
  def vertices(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/vertices").dropDuplicates("vec_id")

  def liveVertices(s: SparkSession, root: String): DataFrame =
    vertices(s, root).join(tombstones(s, root), Seq("vec_id"), "left_anti")

  /** Raw candidate-edge log. */
  def edges(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/edges").select(col("src"), col("dst"), col("d"))

  /** The live k-NN graph: tombstone-filtered, (src, dst)-deduped,
    * per-source top-k by (d, dst) over the candidate log. Candidates
    * beyond rank k stay in the log as backup links — after a delete
    * the view re-ranks and the next-best candidate serves, no graph
    * surgery needed until [[compact]].
    */
  def liveGraph(s: SparkSession, root: String): DataFrame = {
    val k = metaK(s, root)
    val t = tombstones(s, root)
    val ws = Window.partitionBy(col("src")).orderBy(col("d"), col("dst"))
    edges(s, root)
      .join(t.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(t.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
      .groupBy(col("src"), col("dst")).agg(min(col("d")).as("d"))
      .withColumn("rnk", row_number().over(ws).cast("long"))
      .where(col("rnk") <= k)
      .select(col("src"), col("dst"), col("d"), col("rnk"))
  }

  // ---- lifecycle ----

  /** Build the artifact: NN-Descent over `v` (vec_id, v), both halves
    * written fresh, meta marker LAST (a crash mid-build leaves a
    * root without meta.json — unreadable by contract, rebuilt by the
    * caller; never a half-readable artifact). A rebuild IN PLACE over
    * an existing root retires the OLD marker before touching either
    * half (else a crash mid-overwrite leaves new edges + old vertices
    * reading as complete — r16 review) and drops stale tombstones from
    * the prior lifecycle (they would silently shadow rebuilt vertices).
    */
  def build(v: DataFrame, k: Int, rounds: Int, root: String): Unit = {
    val s = v.sparkSession
    Fs.delete(s, s"$root/meta.json")
    Fs.deleteRecursive(s, s"$root/tombstones")
    val vv = v.select(col("vec_id"), col("v"))
    construct(vv, k, rounds).select(col("src"), col("dst"), col("d"))
      .write.mode("overwrite").parquet(s"$root/edges")
    vv.write.mode("overwrite").parquet(s"$root/vertices")
    writeMeta(s, root, k)
  }

  /** INSERT a batch (HNSW §4 insert / FreshDiskANN StreamingMerge
    * insert, batch-parallel): each new vector BEAM-SEARCHES the
    * existing live graph for its neighborhood — no base re-scoring,
    * cost ∝ batch — then three delta-sized candidate families land in
    * the edge log:
    *
    *   new→old   the search's per-vector top-k
    *   old→new   the same rows reversed (HNSW's bidirectional link;
    *             the view prunes each old vertex back to its k best)
    *   new→new   batch pairs sharing a new→old neighbor (two near-dup
    *             inserts both search to the same region, so the
    *             shared-neighbor equi-join finds them — ≤ batch·k²
    *             pairs, never batch²)
    *
    * plus the batch's vertex rows. Edges append BEFORE vertices: a
    * crash between the two jobs leaves edges whose endpoints don't
    * resolve (scoring joins drop them silently) and a retry re-appends
    * both halves — the view's (src, dst) dedup + the vertex read's
    * dropDuplicates make the retry a no-op. Batch ids must be NEW
    * (checked): inserting a live id would duplicate serving rows.
    */
  def append(s: SparkSession, batch: DataFrame, root: String,
             beam: Int, hops: Int): Unit = {
    heal(s, root)
    val k = metaK(s, root)
    val b = batch.select(col("vec_id"), col("v"))
    val clash = b.join(vertices(s, root), Seq("vec_id"), "left_semi").count()
    require(clash == 0L,
      s"KnnGraph.append: $clash batch ids already exist in the index — " +
        "inserts must carry NEW vec_ids (delete + compact first to reuse one)")
    val q = b.select(col("vec_id").as("qid"), col("v").as("qv"))
    val scored = searchScored(s, q, root, beam, hops, identity)
    val wq = Window.partitionBy(col("qid")).orderBy(col("d"), col("nid"))
    val newOut = scored.withColumn("rnk", row_number().over(wq))
      .where(col("rnk") <= k)
      .select(col("qid"), col("nid"), col("d"))
      .transform(Ckpt.eager)
    val rev = newOut.select(col("nid").as("src"), col("qid").as("dst"), col("d"))
    // shared-neighbor pairs among the batch, scored exact
    val nn = newOut.as("a").join(newOut.as("b"), col("a.nid") === col("b.nid"))
      .where(col("a.qid") =!= col("b.qid"))
      .select(col("a.qid").as("src"), col("b.qid").as("dst")).distinct()
      .join(b.select(col("vec_id").as("src"), col("v").as("av")), "src")
      .join(b.select(col("vec_id").as("dst"), col("v").as("bv")), "dst")
      .select(col("src"), col("dst"), sqDist("av", "bv").as("d"))
    newOut.select(col("qid").as("src"), col("nid").as("dst"), col("d"))
      .unionByName(rev).unionByName(nn)
      .distinct()
      .write.mode("append").parquet(s"$root/edges")
    b.write.mode("append").parquet(s"$root/vertices")
    newOut.unpersist()
    ()
  }

  /** Retract ids: one tiny tombstone append, zero graph surgery — the
    * live view re-ranks and the log's backup links keep serving.
    * Physical removal + neighborhood repair is [[compact]].
    */
  def delete(s: SparkSession, ids: DataFrame, root: String): Unit = {
    heal(s, root)
    ids.select(col("vec_id")).write.mode("append").parquet(s"$root/tombstones")
  }

  /** Drop specific tombstone ROWS (the re-survival drain the pipeline
    * reconcile needs — [[graft.pipeline.CorpusPipeline]]'s dedup tier
    * can retract a doc and later re-survive it; a stale tombstone
    * would shadow the still-present vertex forever). Crash-atomic:
    * the surviving tombstones land complete under tombstones.next
    * (job-commit _SUCCESS is the marker), then old-delete + rename —
    * [[heal]] finishes or discards either half-state.
    */
  def dropTombstones(s: SparkSession, ids: DataFrame, root: String): Unit = {
    heal(s, root)
    val next = s"$root/tombstones.next"
    tombstones(s, root)
      .join(ids.select(col("vec_id")), Seq("vec_id"), "left_anti")
      .coalesce(1).write.mode("overwrite").parquet(next)
    Fs.deleteRecursive(s, s"$root/tombstones")
    Fs.rename(s, next, s"$root/tombstones")
  }

  /** CONSOLIDATE (FreshDiskANN's delete consolidation, Singh et al.
    * 2021 §4.2): physically drop tombstoned vertices and their edges,
    * and repair the holes they leave — for every surviving edge a→d
    * into a deleted vertex, the deleted vertex's own out-edges d→d'
    * become candidates a→d' (scored exact), so a's neighborhood heals
    * through the hole instead of shrinking. Per live vertex the new
    * log is the top-k of (surviving candidates ∪ through-deleted
    * candidates) — the view and the log coincide again and every
    * tombstone drains.
    *
    * Crash-atomic write-aside + rename swap (the retrain-swap
    * protocol): the whole new root builds at root.compact with
    * meta.json LAST as the completeness marker, then
    * rename(root→.old) + rename(.compact→root) + delete(.old) keeps a
    * readable root alive at every instant; [[heal]] at every entry
    * point finishes or discards any crash state.
    */
  def compact(s: SparkSession, root: String): Unit = {
    heal(s, root)
    val k = metaK(s, root)
    val t = tombstones(s, root).transform(Ckpt.eager)
    if (t.isEmpty) return // nothing to drain — keep the artifact byte-stable
    val tmp = s"$root.compact"
    val old = s"$root.old"
    Fs.deleteRecursive(s, tmp)
    val lv = liveVertices(s, root).transform(Ckpt.eager)
    val e = edges(s, root)
      .groupBy(col("src"), col("dst")).agg(min(col("d")).as("d"))
      .transform(Ckpt.eager)
    val dead = t.select(col("vec_id"))
    val surviving = e
      .join(dead.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(dead.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
    val intoDead = e
      .join(dead.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst").as("mid"))
    val outOfDead = e.select(col("src").as("mid"), col("dst"))
    val through = intoDead.join(outOfDead, "mid")
      .select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .join(dead.select(col("vec_id").as("src")), Seq("src"), "left_anti")
      .join(dead.select(col("vec_id").as("dst")), Seq("dst"), "left_anti")
      .distinct()
      .join(lv.select(col("vec_id").as("src"), col("v").as("av")), "src")
      .join(lv.select(col("vec_id").as("dst"), col("v").as("bv")), "dst")
      .select(col("src"), col("dst"), sqDist("av", "bv").as("d"))
    val ws = Window.partitionBy(col("src")).orderBy(col("d"), col("dst"))
    surviving.unionByName(through)
      .groupBy(col("src"), col("dst")).agg(min(col("d")).as("d"))
      .withColumn("rnk", row_number().over(ws))
      .where(col("rnk") <= k)
      .select(col("src"), col("dst"), col("d"))
      .write.mode("overwrite").parquet(s"$tmp/edges")
    lv.write.mode("overwrite").parquet(s"$tmp/vertices")
    writeMeta(s, tmp, k) // completeness marker
    Fs.deleteRecursive(s, old)
    Fs.rename(s, root, old)
    Fs.rename(s, tmp, root)
    Fs.deleteRecursive(s, old)
  }

  /** Crash recovery, run at every mutation/search entry (two cheap
    * existence probes in the steady state). Resolves the compact
    * swap's states exactly like the pipeline's adoptRetrain — a
    * COMPLETE write-aside (meta marker present) is adopted wherever
    * the crash stopped, an incomplete one is debris, a stranded .old
    * is finished or (defensively, with no root at all) restored — and
    * the tombstone drain's half-states (tombstones.next with/without
    * its job commit).
    */
  def heal(s: SparkSession, root: String): Unit = {
    val tmp = s"$root.compact"
    val old = s"$root.old"
    if (Fs.exists(s, s"$tmp/meta.json")) {
      if (Fs.exists(s, root)) {
        Fs.deleteRecursive(s, old)
        Fs.rename(s, root, old)
      }
      Fs.rename(s, tmp, root)
      Fs.deleteRecursive(s, old)
    } else {
      if (Fs.exists(s, tmp)) Fs.deleteRecursive(s, tmp)
      if (Fs.exists(s, old)) {
        if (Fs.exists(s, root)) Fs.deleteRecursive(s, old)
        else Fs.rename(s, old, root)
      }
    }
    val next = s"$root/tombstones.next"
    if (Fs.exists(s, s"$next/_SUCCESS")) {
      Fs.deleteRecursive(s, s"$root/tombstones")
      Fs.rename(s, next, s"$root/tombstones")
    } else if (Fs.exists(s, next)) Fs.deleteRecursive(s, next)
  }

  // ---- serving ----

  /** Deterministic best-first beam search over the PERSISTED live
    * graph (Malkov & Yashunin 2018 layer-0, the embed_knn_graph_search
    * semantics): fixed hop budget, fixed beam, (d, nid) tiebreaks,
    * entry = minimum eligible vec_id. `cand` restricts the eligible
    * candidate set (attribute-filtered serving, [[IvfIndex.probe]]'s
    * contract) — it filters both the expansion frontier and the entry
    * choice. Cost: queries × hops × beam edge lookups + the final
    * top-k — INDEPENDENT of corpus size; the graph is read once and
    * locally checkpointed for the hop loop.
    */
  def search(s: SparkSession, q: DataFrame, root: String, beam: Int,
             hops: Int, topk: Int,
             cand: DataFrame => DataFrame = identity): DataFrame = {
    heal(s, root)
    val wr = Window.partitionBy(col("qid")).orderBy(col("d"), col("nid"))
    searchScored(s, q.select(col("qid"), col("qv")), root, beam, hops, cand)
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .where(col("rnk") <= topk)
      .select(col("qid"), col("nid"), col("d"), col("rnk"))
  }

  /** The hop loop shared by [[search]] and [[append]]: returns the
    * LAST hop's fully scored candidate set (qid, nid, d) — callers
    * rank it. No heal here; entry points heal first.
    */
  private def searchScored(s: SparkSession, q: DataFrame, root: String,
                           beam: Int, hops: Int,
                           cand: DataFrame => DataFrame): DataFrame = {
    val lv = cand(liveVertices(s, root))
      .select(col("vec_id").as("nid"), col("v").as("nv"))
      .transform(Ckpt.eager)
    val g0 = liveGraph(s, root).select(col("src"), col("dst"))
    val g = g0.union(g0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().transform(Ckpt.eager)
    val entry = lv.agg(min(col("nid")).as("nid"))
    val dCol = round(greatest(
      Similarity.dot("qv", "qv") + Similarity.dot("nv", "nv")
        - lit(2.0) * Similarity.dot("qv", "nv"), lit(0.0)), 6)
    val wr = Window.partitionBy(col("qid")).orderBy(col("d"), col("nid"))
    var b = q.select(col("qid")).crossJoin(broadcast(entry))
    val beams = scala.collection.mutable.Buffer[DataFrame]()
    var scored: DataFrame = null
    for (_ <- 1 to hops) {
      // eligibility filtering rides the scoring join itself: the inner
      // join against lv below drops ineligible nids, so a separate
      // left_semi pre-filter on the same key was a redundant join per
      // hop (r16-opt; result-identical, one fewer stage × hops × calls)
      val x = b.union(
          b.join(g, b("nid") === g("src")).select(b("qid"), g("dst").as("nid")))
        .distinct()
      scored = x
        .join(lv, "nid")
        .join(broadcast(q), "qid")
        .withColumn("d", dCol)
      // beam is queries×beam rows; the eager checkpoint both cuts the
      // per-hop lineage (iterative discipline) and de-ambiguates the
      // next hop's re-join against g
      b = scored.withColumn("r", row_number().over(wr))
        .where(col("r") <= beam).select(col("qid"), col("nid"))
        .transform(Ckpt.eager)
      beams += b
    }
    // materialize the answer FIRST (the final scored still reads the
    // last beam's blocks — a checkpointed frame is not recomputable
    // once unpersisted), THEN release the per-call checkpointed state:
    // without this every search/append pinned the full vertex set +
    // graph closure + one beam per hop in executor storage for the
    // session (r16 review); the result itself is queries × candidates
    val out = scored.select(col("qid"), col("nid"), col("d"))
      .transform(Ckpt.eager)
    beams.foreach(_.unpersist()); lv.unpersist(); g.unpersist()
    out
  }
}
