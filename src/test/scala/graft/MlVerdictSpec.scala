package graft

import org.apache.spark.sql.functions._
import graft.etl.SensorEtl
import graft.ml.Pipelines
import graft.operators.TimeWindows

/** Verdict-point re-gates of the seeded-fit ML family (r14): each gate
  * emits exact DuckDB-derivable integers + fit-contract booleans. These
  * tests pin both halves at test sf — the integers against independent
  * brute-force recomputes, the booleans to TRUE (the oracle pins the
  * same literals, so a flipped boolean fails here FIRST, with a pointed
  * message, rather than as an opaque driver hash mismatch). The seeded
  * numbers themselves stay pinned by MlPipelineSpec / CrossValAlsSpec /
  * KmeansTopicsSpec via the original entry points. */
class MlVerdictSpec extends SparkTestBase {

  private def boolCols(row: org.apache.spark.sql.Row,
      names: Seq[String]): Unit =
    names.foreach(n => assert(row.getAs[Boolean](n),
      s"contract boolean $n flipped FALSE"))

  test("classification verdict: class universe exact, fit contract booleans true") {
    val out = Pipelines.classificationVerdict(spark, sf).collect()
      .sortBy(_.getAs[String]("target"))
    val wide = SensorEtl.wide(spark, sf)
    val expected = wide.groupBy("code_name").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(out.map(r => (r.getAs[String]("target"),
      r.getAs[Long]("n_class"))).toSeq == expected.toSeq)
    // alphabetAsc label ids are the alphabetical rank
    assert(out.map(_.getAs[Int]("label_id")).toSeq == out.indices.toSeq)
    out.foreach(boolCols(_, Seq("split_exhaustive_ok",
      "preds_in_universe_ok", "f1_unit_ok", "pred_count_ok",
      "indexer_alphabetical_ok")))
  }

  test("regression verdict: labeled-frame integers exact, fit contract booleans true") {
    val out = Pipelines.regressionVerdict(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val labeled = TimeWindows.leadWindow(spark, sf).collect()
    assert(r.getAs[Long]("n_labeled") == labeled.length.toLong)
    val cents = labeled.map { row =>
      BigDecimal(row.getAs[Double]("next_day_max"))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
    }.sum
    assert(r.getAs[Long]("label_cents_sum") == cents)
    assert(r.getAs[Int]("features_dim") == 3)
    boolCols(r, Seq("r2_le_1_ok", "rmse_nonneg_ok",
      "rmse_mse_consistent_ok", "importances_ok", "split_exhaustive_ok"))
  }

  test("cross-val verdict: grid re-enumerated, selection booleans true") {
    val out = Pipelines.crossValidateVerdict(spark, sf).collect()
    assert(out.length == 4)
    assert(out.map(r => (r.getAs[Int]("max_depth"),
      r.getAs[Int]("max_iter"))).toSet ==
      Set((2, 5), (2, 10), (4, 5), (4, 10)))
    val nLabeled = TimeWindows.leadWindow(spark, sf).count()
    assert(out.forall(_.getAs[Long]("n_labeled") == nLabeled))
    out.foreach(boolCols(_, Seq("rmse_finite_pos_ok",
      "spark_chose_argmin_ok")))
    // the min is unique (tie assumption the oracle pins as 1, not TRUE:
    // a tie would surface as a visible 2 != 1, ADVICE r14)
    assert(out.forall(_.getAs[Long]("n_at_min") == 1L))
  }

  test("ALS verdict: interaction universe exact, coverage booleans true") {
    val out = Pipelines.alsRecommendVerdict(spark, sf).collect()
      .sortBy(_.getAs[String]("event_type"))
    val expected = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(out.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("n_users_observed"))).toSeq == expected.toSeq)
    out.foreach(boolCols(_, Seq("rec_coverage_ok", "rec_items_valid_ok",
      "one_rec_per_user_ok")))
  }

  test("k-means verdict: corpus integers exact, cost bounded by total SS") {
    val out = Pipelines.kmeansTopicsVerdict(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    val emb = Tables.embeddings(spark, sf)
    assert(r.getAs[Int]("k") == 8)
    assert(r.getAs[Long]("n_vecs") == emb.count())
    assert(r.getAs[Int]("dims") ==
      emb.select(size(col("embedding"))).head().getInt(0))
    boolCols(r, Seq("sizes_sum_ok", "n_clusters_le_k_ok",
      "cost_nonneg_ok", "cost_le_totalss_ok"))
  }
}
