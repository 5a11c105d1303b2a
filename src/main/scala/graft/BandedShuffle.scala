package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement for the banded verify-stage payload (VERDICT r16
  * "Next" #2): run `q_ngram_jaccard_banded`'s operator at a given sf dir
  * with the size-bound prefilter ON vs OFF (args: sfDir [on|off|both]),
  * printing wall, output rows, the candidate counts before/after the
  * prune, and the job-total shuffle read/write + spill bytes from stage
  * metrics — the receipt that attributes the sf200 ENOSPC scratch
  * (SCALE.md) to the pair+array shuffle and prices the prefilter's cut.
  * Both arms produce IDENTICAL output rows by construction (the prune
  * drops only pairs whose max achievable jaccard already misses τ);
  * this tool exists so that claim carries measured bytes, not prose. */
object BandedShuffle {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = if (args.length > 1) args(1) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val wr = new AtomicLong; val rd = new AtomicLong
    val spillMem = new AtomicLong; val spillDisk = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        wr.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        rd.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        spillMem.addAndGet(m.memoryBytesSpilled)
        spillDisk.addAndGet(m.diskBytesSpilled)
      }
    })
    def gb(x: Long): String = f"${x / 1e9}%.2f GB"

    val docs = Tables.documents(spark, sfDir)
    // candidate-stage diagnostics (shared by both arms): admitted pairs
    // and how many of them the size bound would prune
    val sigs = graft.operators.Dedup.minhashSignatures(docs, 128)
    val cand = graft.operators.Dedup.bandCandidatesFromSigs(sigs, 64, 2, 64)
    val meta = graft.operators.Dedup.docSizes(docs).join(
      graft.operators.Dedup.rarePostings(docs, 100L)
        .groupBy("doc_id").agg(count(lit(1)).cast("long").as("c_n")),
      Seq("doc_id"))
    val judged = cand
      .join(meta.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"),
        col("c_n").as("a_c")), Seq("a_id"))
      .join(meta.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"),
        col("c_n").as("b_c")), Seq("b_id"))
      .select(when(least(col("a_c"), col("b_c")).cast("double") /
        (col("a_n") + col("b_n") - least(col("a_c"), col("b_c"))).cast("double")
        >= lit(0.2 - 1e-9), 1L).otherwise(0L).as("kept"))
      .agg(count(lit(1)).as("cand"), sum(col("kept")).as("kept"))
      .head()
    println(s"[banded-shuffle] sf=$sfDir candidates=${judged.getLong(0)} " +
      s"kept_by_prefilter=${judged.getLong(1)}")

    def run(pf: Boolean): Unit = {
      spark.catalog.clearCache()
      wr.set(0); rd.set(0); spillMem.set(0); spillDisk.set(0)
      val t0 = System.nanoTime()
      val rows = graft.operators.Dedup
        .ngramJaccardBandedDocs(docs, prefilter = pf).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[banded-shuffle] prefilter=$pf rows=$rows t=$secs%.1fs " +
        s"shuffle_write=${gb(wr.get)} shuffle_read=${gb(rd.get)} " +
        s"spill_mem=${gb(spillMem.get)} spill_disk=${gb(spillDisk.get)}")
    }
    if (mode == "on" || mode == "both") run(pf = true)
    if (mode == "off" || mode == "both") run(pf = false)
    spark.stop()
  }
}
