package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver's parquet testdata
  * (/root/testdata/sf*, see TESTDATA.md / FIXTURES.md §B).
  *
  * All tables are plain parquet reads; `events` needs special handling
  * because its `ts` column is a parquet TIMESTAMP(NANOS) which Spark
  * refuses by default. We read it as raw nanos (legacy long mode) and
  * derive microsecond-precision columns, matching DuckDB's ns→µs
  * truncation so oracle queries agree bit-for-bit.
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
    *   - ts_us : epoch microseconds (BIGINT), exact (integer div of nanos)
    *   - ts    : TIMESTAMP at microsecond precision (for window/session ops)
    * Raw nanos are > 2^53 so the division must be integral (`div`), never
    * a double divide.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, dir, "events")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }
}
