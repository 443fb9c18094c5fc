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

/** DuckDB-side mirrors of the engine's shared formulas — ONE source of
  * truth per fragment so an oracle can't silently desync from its Spark
  * twin (each must stay in lockstep with the cited implementation).
  */
object OracleSql {
  /** Mirrors TextOps.portableHash64Sql / functions.PortableHash64. */
  def hash64(saltSql: String, valueSql: String): String =
    s"('0x' || substr(md5(CAST($saltSql AS VARCHAR) || ':' || $valueSql), 1, 15))::BIGINT"

  /** Mirrors Similarity.signBucket (8 sign bits of the first dims). */
  val signBucket: String =
    "CAST(list_sum([CASE WHEN v[i+1] >= 0 THEN (1 << i) ELSE 0 END for i in range(0, 8)]) AS BIGINT)"

  /** Mirrors Multimodal.decodeOne's md5-hex stub arithmetic: 4 hex chars
    * of md5(text) starting at 1-based `from1`, as BIGINT.
    */
  def stubHex(from1: Int): String =
    s"('0x' || substr(md5(text), $from1, 4))::BIGINT"
}
