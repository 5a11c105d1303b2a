package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement for the documented Word2Vec parallelism override
  * (r15 verdict #8): fit the q_word2vec corpus at an EXPLICIT
  * numPartitions (args: sfDir numPartitions [probe]) and print wall
  * time + the top-5 synonyms, so the determinism-for-throughput trade
  * the operator scaladoc describes is priced with numbers (SCALE.md),
  * not asserted. The gate itself stays pinned at numPartitions = 8
  * (the DETERMINISM_r14 receipt); this main exercises the same public
  * parameter a deployment would raise. */
object W2vScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args(1).toInt
    val probe = if (args.length > 2) args(2) else "spark"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val rows = graft.ml.Pipelines
      .word2vec(spark, sfDir, probe = probe, numPartitions = parts)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[w2vscale] parts=$parts%d t=$secs%.1f s top=" +
      rows.map(r => s"${r.getString(1)}:${r.getDouble(2)}").mkString(","))
    spark.stop()
  }
}
