package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics

/** Ad-hoc measurement (guide §1): how much of a text gate is the
  * regex tokenize itself vs the scan, and what a pre-tokenized
  * checkpoint would save. Deleted numbers land in OPTIMIZATION_r17.md. */
object TimeTok {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        f
        println(f"[timetok] $label rep=$rep t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    val docs = Tables.documents(spark, dir)
    time("scan-only sum(length(text))") {
      docs.agg(sum(length(col("text")))).collect()
    }
    time("tokenize+explode+count(term)") {
      docs.select(explode(TextAnalytics.tokens(col("text"))).as("t"))
        .agg(count(lit(1))).collect()
    }
    val chk = docs.select(col("doc_id"),
      TextAnalytics.tokens(col("text")).as("toks")).localCheckpoint(true)
    time("checkpointed toks explode+count") {
      chk.select(explode(col("toks")).as("t")).agg(count(lit(1))).collect()
    }
    time("tf groupBy(doc,term) from raw") {
      docs.select(col("doc_id"), explode(TextAnalytics.tokens(col("text"))).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1))).agg(count(lit(1))).collect()
    }
    time("tf groupBy(doc,term) from checkpoint") {
      chk.select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy("doc_id", "t").agg(count(lit(1))).agg(count(lit(1))).collect()
    }
    spark.stop()
  }
}
