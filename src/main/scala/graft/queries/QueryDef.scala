package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark implementation plus (when
  * SQL-expressible) a DuckDB oracle over the same parquet tables.
  *
  * Determinism contract (so the driver's hash compare is stable):
  *  - every output column is explicitly aliased, identically in both sides;
  *  - rows are ordered by a deterministic key on both sides;
  *  - double outputs are either exact (integer/decimal-derived) or rounded
  *    to 6 decimals where the cross-engine relative error is provably tiny
  *    (averages, cosines); monetary sums go through DECIMAL casts so the
  *    summation is exact and order-independent in both engines.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}
