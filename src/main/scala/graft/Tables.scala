package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata (`/root/repo/TESTDATA.md`). Every
  * query receives an `sfDir` and loads through here so the scan path
  * (parquet, vectorized, column-pruned) is uniform.
  *
  * At 100 TB these would be partitioned/bucketed table locations; the
  * API stays the same — `spark.read.parquet` on a directory prunes
  * partitions and pushes filters exactly like a single file.
  */
object Tables {
  def region(s: SparkSession, d: String): DataFrame    = s.read.parquet(s"$d/region.parquet")
  def nation(s: SparkSession, d: String): DataFrame    = s.read.parquet(s"$d/nation.parquet")
  def customer(s: SparkSession, d: String): DataFrame  = s.read.parquet(s"$d/customer.parquet")
  def supplier(s: SparkSession, d: String): DataFrame  = s.read.parquet(s"$d/supplier.parquet")
  def part(s: SparkSession, d: String): DataFrame      = s.read.parquet(s"$d/part.parquet")
  def orders(s: SparkSession, d: String): DataFrame    = s.read.parquet(s"$d/orders.parquet")
  def lineitem(s: SparkSession, d: String): DataFrame  = s.read.parquet(s"$d/lineitem.parquet")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read it as raw nanos (legacy conf) and truncate to microseconds —
    * the same ns→µs truncation DuckDB applies, so oracles agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/documents.parquet")
  def embeddings(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/embeddings.parquet")
}
