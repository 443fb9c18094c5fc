package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running (prefix) sums over an ordered table — the
  * two-level bucketed form of `sum(x) OVER (ORDER BY k)`.
  *
  * A bare unpartitioned window is correct but collapses to ONE task:
  * every row sorts and streams through a single partition, so the
  * moment the ordered table is corpus-sized (a continuous classifier
  * score has ~n distinct values) the cumulative becomes the job's
  * serial bottleneck. The standard fix is the textbook parallel scan
  * (Blelloch 1990) expressed in relational form:
  *
  *   1. range-bucket the order key (monotone bucketing, so buckets are
  *      contiguous key ranges) — one tiny min/max rollup broadcast back;
  *      with `balanced=true` the boundaries are key QUANTILES instead
  *      (one percentile_approx rollup), which upgrades best-effort
  *      balance to a mass guarantee: every bucket holds ≈1/buckets of
  *      the rows (±sketch error) no matter how outliers stretch the
  *      range — the continuous-score callers' setting;
  *   2. run the cumulative WITHIN each bucket
  *      (`Window.partitionBy(bucket)` — parallel, state bounded by the
  *      bucket); and
  *   3. roll buckets up to per-bucket totals (≤ `buckets` rows), take
  *      the EXCLUSIVE prefix over that tiny table, and broadcast the
  *      bucket offsets back: global_cum = local_cum + offset.
  *
  * The only unpartitioned window left in the plan orders the ≤`buckets`-
  * row rollup by `__ps_bucket` — bounded by construction, which is what
  * PlanSpec's window sweep keys on (an unpartitioned window is legal
  * IFF it orders by [[PrefixSum.BucketCol]]).
  *
  * Used by the eval-harness cumulatives (ml_auc / ml_pr_curve /
  * ml_ks_test / ml_decision_stump / ml_gini / ml_psi and the per-source
  * ml_mad / ml_outlier_iqr rank selections) whose DuckDB oracles keep
  * the single-window form — the differential PrefixSumSpec pins
  * two-level ≡ global on random data.
  */
object PrefixSum {

  /** The synthetic bucket column name. PlanSpec's global window sweep
    * recognizes unpartitioned windows ordered by this name as the
    * bounded bucket-rollup prefix and passes them without an allowlist
    * entry.
    */
  val BucketCol = "__ps_bucket"

  /** percentile_approx accuracy used by the balanced branch; exposed so
    * the [[bucketize]] mass bound is a stated, spec-checkable contract.
    */
  val BalancedAccuracy = 10000

  /** Adds [[BucketCol]] to `g`: contiguous monotone buckets over
    * `order`, range-uniform by default, key-QUANTILE boundaries with
    * `balanced=true`.
    *
    * Balanced mass bound (the r12-verdict contract, pinned by
    * PrefixSumSpec): for an all-distinct key column of n rows, every
    * bucket holds at most n/buckets + 2·n/[[BalancedAccuracy]] rows —
    * percentile_approx's GK sketch guarantees each boundary's RANK is
    * within n/accuracy of its target, and a bucket's mass is the rank
    * gap between two boundaries — i.e. ≤ ~1.013× the ideal share at the
    * defaults (64 buckets, accuracy 10⁴). Repeated keys concentrate
    * irreducibly (equal keys must share a bucket, or the bucketing
    * stops being monotone); correctness never depends on balance
    * either way.
    */
  private[graft] def bucketize(g: DataFrame, partitionCols: Seq[String],
      order: String, buckets: Int, balanced: Boolean): DataFrame = {
    val pc = partitionCols.map(col)
    val x = col(order).cast("double")
    // NULL order keys would bucket to NULL and the offset equi-join
    // would silently DROP the rows (r11 advice) — fail loud instead.
    // raise_error in the when-branch keeps the check inside the used
    // bucket expression, so column pruning can never eliminate it.
    def nullGuarded(b: Column): Column = when(x.isNull, raise_error(lit(
      s"PrefixSum.running: null order key '$order' — pre-filter or coalesce before the scan"))
      .cast("int")).otherwise(b)
    if (balanced) {
      // MASS-balanced bucketing (the r11 hardening): boundaries are the
      // 1/buckets..(buckets-1)/buckets quantiles of the key (one
      // sketch rollup broadcast back), so an outlier-stretched domain —
      // 99% of rows inside 1/64 of the RANGE — still spreads across
      // ~buckets buckets. bucket = #boundaries <= x is monotone in x,
      // so equal keys share a bucket and bucket ranges stay contiguous;
      // correctness is invariant to the boundary choice (PrefixSumSpec
      // pins balanced == uniform == global on a pathological fixture).
      val bndC = "__ps_bnds"
      val pcts = (1 until buckets).map(i => i.toDouble / buckets)
      val bAgg = percentile_approx(x, lit(pcts.toArray),
        lit(BalancedAccuracy)).as(bndC)
      val bnds =
        if (pc.isEmpty) g.agg(bAgg)
        else g.groupBy(pc: _*).agg(bAgg)
      val joined =
        if (pc.isEmpty) g.crossJoin(broadcast(bnds))
        else g.join(broadcast(bnds), partitionCols)
      val bkt = nullGuarded(aggregate(col(bndC), lit(0),
        (acc, bd) => acc + when(x >= bd, 1).otherwise(0)))
      joined.withColumn(BucketCol, bkt).drop(bndC)
    } else {
      val mnC = "__ps_mn"
      val mxC = "__ps_mx"
      val boundsAgg = Seq(min(col(order)).cast("double").as(mnC),
        max(col(order)).cast("double").as(mxC))
      val bounds =
        if (pc.isEmpty) g.agg(boundsAgg.head, boundsAgg.tail: _*)
        else g.groupBy(pc: _*).agg(boundsAgg.head, boundsAgg.tail: _*)
      val joined =
        if (pc.isEmpty) g.crossJoin(broadcast(bounds))
        else g.join(broadcast(bounds), partitionCols)
      // Monotone range bucketing: double division/multiplication by a
      // positive constant rounds monotonically, so equal keys land in one
      // bucket and bucket ranges are contiguous — balance is best-effort
      // (uniform over the key RANGE; pass balanced=true for a mass
      // guarantee), correctness never depends on it.
      val bkt = nullGuarded(when(col(mxC) === col(mnC), lit(0)).otherwise(
        least(lit(buckets - 1),
          floor((x - col(mnC)) / (col(mxC) - col(mnC)) * buckets).cast("int"))))
      joined.withColumn(BucketCol, bkt).drop(mnC, mxC)
    }
  }

  /** Adds, for every measure `m`, an INCLUSIVE running sum `m_cum`
    * (`sum(m) OVER (PARTITION BY partitionCols ORDER BY order ROWS
    * UNBOUNDED PRECEDING..CURRENT ROW)`, cast long) and — when
    * `withTotals` — the per-partition grand total `m_tot`.
    *
    * Requirements: (`order`, `tieBreaks`) is unique within each
    * partition group (the callers run over DISTINCT-value rollups or
    * supply a key-completing tie-break) and `order` is non-null —
    * ENFORCED: a null key raises (raise_error inside the bucket
    * expression) rather than silently dropping the row in the offset
    * join; measures are integral (sums are cast to BIGINT). Exclusive
    * prefixes are the caller's one-liner (`m_cum - m`).
    *
    * Scale shape: one hash exchange on (partitionCols, bucket) feeds
    * the within-bucket windows; the bucket rollup is map-side combined
    * down to ≤ groups×buckets rows and broadcast back, so no stage is
    * single-task in the data. `partitionCols` must be low-cardinality
    * enough for that broadcast (sources/classes — the grouped callers);
    * at huge group counts drop to the plain partitioned window instead,
    * which is already parallel in the group.
    */
  def running(
      g: DataFrame,
      partitionCols: Seq[String],
      order: String,
      measures: Seq[String],
      descending: Boolean = false,
      withTotals: Boolean = false,
      buckets: Int = 64,
      tieBreaks: Seq[Column] = Nil,
      balanced: Boolean = false): DataFrame = {
    require(measures.nonEmpty, "need at least one measure")
    val pc = partitionCols.map(col)
    val bucketed = bucketize(g, partitionCols, order, buckets, balanced)

    // Bucketing keys on `order` alone, so equal order values share a
    // bucket and `tieBreaks` (sort-order columns making the composite
    // order unique — the global-RANK use) only ever reorder WITHIN one.
    val ordCol = if (descending) col(order).desc else col(order).asc
    val w = Window.partitionBy(pc :+ col(BucketCol): _*).orderBy(ordCol +: tieBreaks: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = measures.foldLeft(bucketed) { (d, m) =>
      d.withColumn(s"${m}_cum", sum(col(m)).over(w).cast("long"))
    }

    val tAgg: Seq[Column] = measures.map(m => sum(col(m)).cast("long").as(s"__ps_t_$m"))
    val roll = bucketed.groupBy(pc :+ col(BucketCol): _*).agg(tAgg.head, tAgg.tail: _*)
    val bOrd = if (descending) col(BucketCol).desc else col(BucketCol).asc
    val bw = Window.partitionBy(pc: _*).orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tw = Window.partitionBy(pc: _*).orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = measures.foldLeft(roll) { (d, m) =>
      val d1 = d.withColumn(s"__ps_o_$m",
        coalesce(sum(col(s"__ps_t_$m")).over(bw), lit(0L)).cast("long"))
      if (withTotals) d1.withColumn(s"${m}_tot", sum(col(s"__ps_t_$m")).over(tw).cast("long"))
      else d1
    }.drop(measures.map(m => s"__ps_t_$m"): _*)

    val out = local.join(broadcast(offs), partitionCols :+ BucketCol)
    measures.foldLeft(out) { (d, m) =>
      d.withColumn(s"${m}_cum", (col(s"${m}_cum") + col(s"__ps_o_$m")).cast("long"))
    }.drop(measures.map(m => s"__ps_o_$m"): _*).drop(BucketCol)
  }
}
