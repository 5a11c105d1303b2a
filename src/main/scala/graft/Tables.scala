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
  /** events.ts has shipped in two physical shapes across driver testdata
    * generations: TIMESTAMP(NANOS) (which Spark's reader rejects — read
    * as raw int64 under the legacy conf and truncate ns→µs, the same
    * truncation DuckDB applies) and annotated micros with
    * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ — cast to
    * the session type; the session timezone is pinned UTC everywhere, so
    * the wall-clock reading equals DuckDB's naive TIMESTAMP). Branch on
    * the footer schema so both generations — and the ScaleUp fixtures,
    * which write plain int64 nanos — load identically. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(s.read.parquet(s"$d/events.parquet"))
  }

  /** ns-long / NTZ / session-timestamp `ts` column → session TimestampType
    * (epoch micros under the UTC session tz). Shared by the batch loader
    * and every streaming file source over events.parquet. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType            => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _: TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                   => df
    }
  }

  /** The on-file type of events.ts under `d` (LongType for the legacy
    * nanos shape, TimestampNTZType for annotated micros) — streaming file
    * sources need it to declare a user schema that matches the footer. */
  def eventsTsFileType(s: SparkSession, d: String): org.apache.spark.sql.types.DataType = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet").schema("ts").dataType
  }
  def documents(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/documents.parquet")
  def embeddings(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/embeddings.parquet")
}
