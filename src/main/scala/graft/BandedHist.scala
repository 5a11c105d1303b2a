package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement for the banded-LSH growth curve (r15 verdict #6):
  * print the band-bucket size histogram + candidate-pair mass at a
  * given sf dir (args: sfDir), attributing the banded gate's per-decade
  * step to either bucket-count growth (linear corpus growth) or
  * bucket-size growth (skew the maxBucket cap must bound). */
object BandedHist {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val h = graft.operators.Dedup
      .bandBucketHistogram(Tables.documents(spark, sfDir))
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    val nDocs = Tables.documents(spark, sfDir).count()
    println(f"[bandedhist] sf=$sfDir docs=$nDocs t=$secs%.1f s")
    h.foreach { r =>
      println(s"[bandedhist] size=${r.getAs[Long]("sz")} " +
        s"buckets=${r.getAs[Long]("n_buckets")} " +
        s"pair_mass=${r.getAs[Long]("pair_mass")}")
    }
    spark.stop()
  }
}
