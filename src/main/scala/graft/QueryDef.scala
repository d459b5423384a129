package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One named operator/query exposed through [[SparkEntry]].
  *
  * @param fn     builds the result from (session, testdata dir)
  * @param oracle equivalent ANSI SQL the driver runs in DuckDB over the
  *               same parquet tables; None → driver falls back to a
  *               rows-only check (used for ops whose results depend on
  *               engine-internal hash functions, e.g. HLL / xxhash LSH).
  */
final case class QueryDef(
    name: String,
    oracle: Option[String])(
    val fn: (SparkSession, String) => DataFrame)

/** Shared helpers that keep Spark results hash-comparable with DuckDB.
  *
  * Determinism rules used across all queries (see SURVEY.md §7.3):
  *   - every query ends in a total ORDER BY over a unique key
  *   - double aggregates are cast to DECIMAL — bit-stable on both engines
  *     (an order-dependent double sum differs only ~1e-9 relative, far
  *     below the decimal quantum)
  *   - integer-ish outputs are BIGINT on both sides (DuckDB sum(int) is
  *     HUGEINT, Spark length() is INT — both need explicit casts)
  */
object Qdsl {
  /** money-scale aggregate: stable to a cent */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  /** ratio/average-scale aggregate */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))
  /** similarity-scale value in [-1, 1] */
  def dec6(c: Column): Column = c.cast(DecimalType(9, 6))
  def big(c: Column): Column = c.cast("long")
}
