package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED IVF index lifecycle — the ANN artifact a 100 TB pipeline
  * builds once per corpus snapshot and serves for months: a trained
  * quantizer (k×d centroid table) plus cell assignments hive-partitioned
  * BY CELL, so a probe reads only its nprobe cells' files (dynamic
  * partition pruning does for ANN what split pruning does for eval
  * readers — PlanSpec asserts the pruning on the probe).
  *
  * [[append]] is the incremental path (the CorpusPipeline.append analog
  * for embeddings): new batch vectors assign to the EXISTING quantizer
  * cells (centroids held fixed — one broadcast-table argmin over the
  * batch only) and land as new files under the existing cell
  * partitions, so append cost scales with the BATCH, never the base.
  * Probes then see base ∪ batches transparently. With fixed centroids,
  * append ≡ full rebuild exactly (IvfIndexSpec pins it; the
  * embed_ivf_index_append oracle states it corpus-wide); cell-population
  * drift — the retrain trigger — is surfaced by embed_index_drift's
  * PSI over cell ids.
  */
object IvfIndex {

  /** Fit a k-cell quantizer on `v` (vec_id, v) and persist both halves
    * of the index under `root`.
    */
  def build(v: DataFrame, k: Int, iters: Int, root: String): Unit = {
    val (assigned, cents) = graft.ml.KMeans.fit(
      v, graft.ml.KMeans.seedSmallest(v, k), iters)
    cents.write.mode("overwrite").parquet(s"$root/centroids")
    assigned.select(col("vec_id"), col("v"), col("cl"))
      .write.mode("overwrite").partitionBy("cl").parquet(s"$root/assignments")
  }

  /** Assign `batch` to the PERSISTED centroids and append the rows to
    * the cell-partitioned assignments — no base rewrite, no refit.
    */
  def append(s: SparkSession, batch: DataFrame, root: String): Unit =
    graft.ml.KMeans.assign(batch, centroids(s, root))
      .select(col("vec_id"), col("v"), col("cl"))
      .write.mode("append").partitionBy("cl").parquet(s"$root/assignments")

  def centroids(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/centroids")

  /** Read-back of the assignment half. `cl` comes back as a hive
    * partition column: the cast pins its type against partition-column
    * type inference.
    */
  def assignments(s: SparkSession, root: String): DataFrame =
    s.read.parquet(s"$root/assignments")
      .select(col("vec_id"), col("v"), col("cl").cast("long").as("cl"))

  /** nprobe-cell probe + exact cosine top-k over the persisted index —
    * the embed_knn_ivf_kmeans semantics (round-6 centroid distances,
    * cell/neighbor id tie-breaks) against the read-back artifact.
    * `cand` pre-filters the candidate scan (e.g. excluding the query
    * block itself).
    */
  def probe(s: SparkSession, q: DataFrame, root: String, nprobe: Int, topk: Int,
      cand: DataFrame => DataFrame = identity): DataFrame = {
    val cw = broadcast(centroids(s, root).select(col("cl"), col("cv"),
      Similarity.dot("cv", "cv").as("c2")))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("__d"), col("cl"))
    val probed = q.crossJoin(cw)
      .withColumn("__d", round(sqrt(greatest(
        Similarity.dot("qv", "qv") + col("c2")
          - lit(2) * Similarity.dot("qv", "cv"), lit(0.0))), 6))
      .withColumn("cr", row_number().over(wc))
      .where(col("cr") <= nprobe)
      .select(col("qid"), col("qv"), col("cl").as("cell"))
    val c = cand(assignments(s, root))
      .select(col("vec_id").as("nid"), col("v").as("cv2"), col("cl"))
    val pairs = c.join(broadcast(probed), c("cl") === probed("cell"))
      .withColumn("sim", Similarity.cosine("qv", "cv2"))
      .select(col("qid"), col("nid"), col("sim"))
    Similarity.topK(pairs, topk).select(col("qid"), col("nid"), col("sim"), col("rnk"))
  }
}
