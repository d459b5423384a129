package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver's parquet testdata
  * (/root/testdata/sf*, see TESTDATA.md / FIXTURES.md §B).
  *
  * All tables are plain parquet reads; `events` needs special handling
  * because its `ts` column has shipped in two vintages: parquet
  * TIMESTAMP(NANOS) (rounds ≤ 4), which Spark only reads as raw BIGINT
  * nanos under the legacy flag, and plain timestamp[us] (round 5+),
  * which reads as TIMESTAMP_NTZ. Both normalize to the same
  * (ts TIMESTAMP, ts_us BIGINT) pair, matching DuckDB's `epoch_us(ts)`
  * on the same file so oracle queries agree bit-for-bit.
  */
object Tables {

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` normalized:
    *   - ts_us : epoch microseconds (BIGINT), exact
    *   - ts    : TIMESTAMP at microsecond precision (for window/session ops)
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(spark, dir, "events"))
  }

  /** ts (BIGINT nanos | TIMESTAMP[_NTZ] µs) → (ts TIMESTAMP µs,
    * ts_us BIGINT), dispatching on the column's actual type:
    *   - BIGINT nanos (legacy-flag read of TIMESTAMP(NANOS)): raw
    *     nanos are > 2^53, so the division must be integral (`div`),
    *     never a double divide;
    *   - TIMESTAMP_NTZ (timestamp[us] files): the session timezone is
    *     pinned UTC everywhere (build.sbt / Verify / Bench / specs),
    *     so the NTZ→LTZ cast is the identity on the stored micros and
    *     unix_micros recovers exactly DuckDB's `epoch_us(ts)`.
    */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    val tsUs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
