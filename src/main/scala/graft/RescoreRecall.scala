package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev measurement for the rescore twins' routing recall (VERDICT r16
  * "Next" #7): top-k agreement of [[graft.operators.Similarity
  * .maxSimTopKRescore]] (IVF-routed candidates, exact scoring) and
  * [[graft.operators.Similarity.maxSimTopKRescoreAdc]] (same + PQ-ADC
  * top-m prune) against the UNROUTED exact [[graft.operators.Similarity
  * .maxSimTopK]] truth at an oracle-able scale (args: sfDir) — the
  * q_ann_recall / q_simhash_recall receipt pattern, so the "standard IVF
  * trade" claim in the rescore scaladoc carries a measurement. Recall is
  * mean over queries of |got ∩ truth| / |truth| (truth block can be
  * smaller than k). */
object RescoreRecall {
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

    def topk(df: DataFrame): (Map[Long, Set[Long]], Double) = {
      val t0 = System.nanoTime()
      val rows = df.select("q_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val secs = (System.nanoTime() - t0) / 1e9
      (rows.groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).toSet },
        secs)
    }
    def recallVs(truth: Map[Long, Set[Long]],
        got: Map[Long, Set[Long]]): Double = {
      val per = truth.toSeq.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }

    val (exact, tExact) = topk(graft.operators.Similarity.maxSimTopK(spark, sfDir))
    val (resc, tResc) = topk(graft.operators.Similarity.maxSimTopKRescore(spark, sfDir))
    val (adc, tAdc) = topk(graft.operators.Similarity.maxSimTopKRescoreAdc(spark, sfDir))
    println(f"[rescore-recall] sf=$sfDir queries=${exact.size} " +
      f"exact_t=$tExact%.1fs rescore_t=$tResc%.1fs adc_t=$tAdc%.1fs")
    println(f"[rescore-recall] recall rescore_vs_exact=${recallVs(exact, resc)}%.4f " +
      f"adc_vs_exact=${recallVs(exact, adc)}%.4f " +
      f"adc_vs_rescore=${recallVs(resc, adc)}%.4f")
    spark.stop()
  }
}
