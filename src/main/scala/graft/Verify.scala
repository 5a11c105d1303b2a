package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      try writeOrdered(fn(spark, sfDir), s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // isolate queries (see Bench); the memo-aware sweep drops stray
        // caches and fixpoint-round checkpoints but keeps the memoized
        // family intermediates (dedup clusters / cleaned corpus) alive
        // across queries — the cross-query sharing Memo exists for
        Memo.sweep(spark)
      }
    }
    writeOracleJson(outDir)
    spark.stop()
  }

  /** Write a query result as ONE parquet file in a deterministic row
    * order (all columns, asc nulls-first — Spark's default, matching the
    * oracle's ORDER BY ALL NULLS FIRST wrapper). Keeps the driver's
    * hash-compare stable whether or not it sorts rows itself. */
  def writeOrdered(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    df.orderBy(df.columns.map(col).toSeq: _*)
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Dump SparkEntry.oracleSql as JSON (shared with VerifyOne). */
  def writeOracleJson(outDir: String): Unit = {
    // wrap every oracle so its rows come back in the same deterministic
    // order writeOrdered gives the Spark dump (see writeOrdered scaladoc)
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val wrapped = s"SELECT * FROM (\n$v\n) graft_ordered ORDER BY ALL NULLS FIRST"
        s"${JsonUtil.jstr(k)}: ${JsonUtil.jstr(wrapped)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
