package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: run a subset of SparkEntry.queries (args: sfDir outDir
  * [name1 name2 ...]; no names = all), writing the same layout Verify
  * does. Keeps the iterate-on-one-query loop fast. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir  = args(0)
    val outDir = args(1)
    val names  = if (args.length > 2) args.drop(2).toSet else SparkEntry.queries.keySet
    val unknown = names -- SparkEntry.queries.keySet
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} (known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")})")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // keep the oracle dump in sync so tools/check.py sees new oracles
    Verify.writeOracleJson(outDir)
    SparkEntry.queries.filter(q => names(q._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        Verify.writeOrdered(fn(spark, sfDir), s"$outDir/$name")
        println(f"[verify-one] $name ok (${(System.nanoTime() - t0) / 1e9}%.1f s)")
      } catch {
        case e: Throwable =>
          println(s"[verify-one] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
