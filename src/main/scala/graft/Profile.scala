package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling: time named queries step by step (args: sfDir name...). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen path once
    Tables.events(spark, sfDir).count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[profile] $name rows=$n%d t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      val t1 = System.nanoTime()
      val n2 = fn(spark, sfDir).count()
      println(f"[profile] $name (2nd) rows=$n2%d t=${(System.nanoTime() - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
