package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair list — the step that
  * turns near-duplicate PAIRS into duplicate CLUSTERS (keep the minimum
  * id per cluster, drop the rest).
  *
  * Min-label propagation with POINTER JUMPING: every node starts as its
  * own representative; each round a node (a) adopts the minimum label
  * among itself and its neighbors, then (b) shortcuts to its label's
  * label (`rep := min(rep, rep(rep))`). The neighbor hop alone needs
  * O(diameter) rounds on chains; the jump contracts label paths
  * geometrically, giving O(log diameter) — the same round bound as the
  * large-star/small-star alternating algorithm, with the label table
  * (not the edge multiset) as the only state that mutates. Each neighbor
  * hop shuffles the edge table once; each jump is a labels⋈labels join
  * (small — two longs per node).
  */
object Components {

  /** Rounds taken by the most recent `connectedComponents` call on this
    * JVM (diagnostic only — read by specs and bench logging).
    */
  @volatile var lastRounds: Int = 0

  /** pairs(i, j) -> (node, rep) for every node appearing in any pair.
    *
    * Runs to an exact fixpoint: labels only ever decrease (union+min and
    * least() are both non-increasing), so the label sum is strictly
    * monotone and equality between rounds proves no label moved — in
    * particular the plain neighbor hop produced no change, which is
    * exactly the min-label-propagation fixpoint, i.e. true CC labels.
    * `maxIterations` is a runaway guard, not a correctness bound.
    *
    * @param checkpointDir when set, per-round lineage truncation uses a
    *   RELIABLE checkpoint under this directory (HDFS/object-store safe:
    *   survives executor loss on a real cluster). Default local
    *   checkpoints keep blocks in executor storage — fine for local[n],
    *   not fault-tolerant at cluster scale. Two cluster caveats: this
    *   sets the session-global SparkContext checkpoint dir, and reliable
    *   checkpoint FILES outlive the run unless
    *   `spark.cleaner.referenceTracking.cleanCheckpoints=true` (or the
    *   caller prunes the directory) — budget the store accordingly on
    *   long-lived sessions.
    */
  def connectedComponents(pairs: DataFrame, maxIterations: Int = 50,
                          checkpointDir: Option[String] = None): DataFrame = {
    val spark = pairs.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // checkpoint per round: each round references the previous labels
    // more than once, so an uncut lineage doubles every iteration (2^k
    // copies of the upstream pair computation — measured 24 s vs 9 s at
    // sf0.1). Truncating the plan per round is the standard iterative-
    // algorithm discipline.
    def ckpt(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.transform(graft.ops.Ckpt.eager)

    // materialize the (often expensive) pair plan exactly ONCE — the
    // undirected expansion, node set, and self-loops below all reference
    // it, and without this cut the upstream pipeline (e.g. the full
    // shingle/prefix-filter dedup plan) re-executes per reference
    val p0 = ckpt(pairs.select(col("i"), col("j")))
    val undirected = p0.select(col("i").as("a"), col("j").as("b"))
      .unionByName(p0.select(col("j").as("a"), col("i").as("b")))
    // self-loops folded in ONCE so the per-round hop is join+agg with no
    // Union in the iterated plan (a labels-union per round both doubles
    // the plan and trips Catalyst's Union constraint rewriting when the
    // same label subtree later self-joins for the pointer jump)
    val edges = ckpt(undirected.unionByName(
      undirected.select(col("a")).distinct()
        .select(col("a"), col("a").as("b"))))
    p0.unpersist()
    // init = the first neighbor hop for free: one groupBy over edges
    // (self-loops included), no join — rep₀ = min({self} ∪ neighbors)
    var labels = ckpt(edges.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("rep")))
    // convergence probe: exact DECIMAL(38,0) sum — labels only decrease,
    // so equal sums prove a fixpoint. Decimal because a LongType sum of
    // monotonically_increasing_id-scale ids overflows at ~10^6 nodes
    // (ANSI: ARITHMETIC_OVERFLOW aborts; non-ANSI: wraparound breaks the
    // monotonicity argument). coalesce: sum over ZERO rows is null — an
    // empty pair set must yield an empty result, not an NPE.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("rep").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    try {
    while (!converged && iter < maxIterations) {
      val prev = labels
      // one (hop, jump) pass per checkpoint round: the jump doubles the
      // label reach each round, so total rounds stay O(log d) while the
      // per-round stage count stays at one edge join + one label join
      // (measured: a second pass per round cost more in fixed stage
      // overhead than it saved in rounds on low-diameter dedup graphs)
      // (a) neighbor hop: rep := min over {self} ∪ neighbors (the
      // self-loop rows make the aggregate cover the node's own label)
      var l = edges
        .join(labels, edges("b") === labels("node"))
        .select(edges("a").as("node"), col("rep"))
        .groupBy("node").agg(min("rep").as("rep"))
      // (b) pointer jump: rep := min(rep, rep's rep). Reps are always
      // ids of nodes present in the label table (they start as node
      // ids and only min-combine), so the inner self-join is total.
      val r = l.select(col("node").as("__rn"), col("rep").as("__rr"))
      l = l.join(r, col("rep") === col("__rn"))
        .select(col("node"), least(col("rep"), col("__rr")).as("rep"))
      labels = ckpt(l)
      prev.unpersist() // previous round's blocks are dead once the new
                       // checkpoint is materialized — don't pin executor
                       // storage for the rest of the session
      val s = labelSum(labels)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    lastRounds = iter
    // one line per run: rounds are THE cost driver of iterative CC
    System.err.println(s"[graft.Components] converged in $iter rounds")
    if (!converged)
      // returning non-converged labels would silently keep multiple
      // "survivors" inside one duplicate cluster downstream — fail loud
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations rounds " +
          "(hop+jump contracts O(log diameter) — raise maxIterations)")
    labels
    } finally edges.unpersist() // also on the non-convergence throw —
                                // don't pin checkpointed edge blocks in
                                // executor storage for the session
  }

  /** INCREMENTAL CC — merge a NEW edge batch into a persisted (node,
    * rep) cluster map without recomputing components over the prior
    * graph: `mergeBatch(cc(E_prior), E_new) == cc(E_prior ∪ E_new)`
    * exactly (ComponentsSpec differential), for any id order — min-rep
    * labels need no monotonic-id discipline.
    *
    * Mechanics: new edges CONTRACT onto prior representatives (an
    * unseen endpoint is its own rep), [[connectedComponents]] runs on
    * the contracted graph only — batch-sized, never the corpus — and
    * the resulting rep→rep remap joins back over the prior map. A
    * merged component's new label is min over its members because each
    * prior rep is already its component's min and the contracted CC
    * takes the min over {prior reps, new node ids}.
    *
    * At 100 TB: the daily dedup-graph growth path — per batch, two
    * broadcast-able lookups of the new edges against the cluster map,
    * one CC over |E_new| contracted edges, and ONE join over the
    * cluster map to apply the remap. Nothing scales with the prior
    * EDGE set; the prior pair table is never touched.
    */
  def mergeBatch(clusters: DataFrame, newEdges: DataFrame): DataFrame = {
    val cn = clusters.select(col("node"), col("rep"))
    val e = newEdges.select(col("i"), col("j"))
      .join(cn.select(col("node").as("i"), col("rep").as("__ri")), Seq("i"), "left")
      .join(cn.select(col("node").as("j"), col("rep").as("__rj")), Seq("j"), "left")
      .select(coalesce(col("__ri"), col("i")).as("i"),
        coalesce(col("__rj"), col("j")).as("j"))
    // CC over the CONTRACTED batch graph (nodes = touched prior reps ∪
    // brand-new node ids) — batch-sized by construction
    val remap = connectedComponents(e)
      .select(col("node").as("__old"), col("rep").as("__new"))
    val updatedPrior = cn.join(remap, cn("rep") === col("__old"), "left")
      .select(col("node"), coalesce(col("__new"), col("rep")).as("rep"))
    // nodes the batch introduced: their contracted id is themselves
    val newNodes = newEdges.select(col("i").as("node"))
      .unionByName(newEdges.select(col("j").as("node")))
      .distinct()
      .join(cn.select(col("node")), Seq("node"), "left_anti")
    val newRows = newNodes.join(remap, col("node") === col("__old"))
      .select(col("node"), col("__new").as("rep"))
    updatedPrior.unionByName(newRows)
  }
}
