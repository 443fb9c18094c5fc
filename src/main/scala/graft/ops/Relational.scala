package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join/set-operation helpers with scale-conscious defaults.
  *
  * The reference's only joins are small equi-joins (J1-J4,
  * bicis/etl/feature_extraction/build_dataset.py:71-74, basic_features
  * .py:63-66) plus per-row Redis lookups (hour_feature_builder.py:43-45)
  * that are semantically broadcast hash joins. The engine exposes them as
  * plain Catalyst joins: dimension tables get an explicit `broadcast()`
  * hint (no shuffle of the fact side); fact-fact joins shuffle on the key
  * and rely on AQE for skew splitting at scale.
  */
object Relational {

  /** Exact money arithmetic: decimal cast so sums are order-independent
    * and bit-identical across engines (then surfaced as double).
    */
  def money(c: Column): Column = c.cast("decimal(12,2)")
  def rate(c: Column): Column = c.cast("decimal(4,2)")

  /** revenue = sum(extendedprice * (1 - discount)) — exact, then double. */
  def revenue(price: Column, discount: Column): Column =
    sum(money(price) * (lit(1) - rate(discount))).cast("double")

  /** Star join: fact ⋈ broadcast dims, one at a time (dims are tiny). */
  def starJoin(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, cond)) => acc.join(broadcast(dim), cond) }
}
