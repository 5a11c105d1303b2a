package graft

import org.scalatest.funsuite.AnyFunSuite

/** The gate registry after the family split (r8 verdict #7): SparkEntry
  * is a thin concatenation of graft.gates.* family objects, so the
  * invariants the old single-file Map gave for free — unique keys,
  * every oracle key backed by a query — are pinned here instead. */
class GateRegistrySpec extends AnyFunSuite {

  test("family query keys never collide and concatenation loses nothing") {
    val perFamily = SparkEntry.families.map { case (name, qs, _) => name -> qs.keySet }
    for {
      (na, ka) <- perFamily
      (nb, kb) <- perFamily if na < nb
      dup = ka.intersect(kb) if dup.nonEmpty
    } fail(s"$na and $nb both define ${dup.mkString(", ")}")
    assert(SparkEntry.queries.size == perFamily.map(_._2.size).sum)
  }

  test("every oracle key has a query in the SAME family") {
    for ((name, qs, os) <- SparkEntry.families) {
      val orphans = os.keySet.diff(qs.keySet)
      assert(orphans.isEmpty, s"$name oracles without queries: ${orphans.mkString(", ")}")
    }
    assert(SparkEntry.oracleSql.size ==
      SparkEntry.families.map(_._3.size).sum)
  }

  test("registry carries the full suite (220 queries, 220 oracles)") {
    // r13: +q_arma_hr (218); oracles 189 + {q_semdedup, q_semdedup_linear,
    // q_compaction_plan, q_arma_hr, q_pq_topk, q_ivf_pq_topk,
    // q_ivf_pq_topk_res, q_ivf_pq_recall, q_ivf_pq_recall_res,
    // q_ann_recall, q_media_phash_neardup, q_simhash, q_simhash_neardup,
    // q_simhash_recall, q_minhash_lsh} = 204.
    // r14 verdict-point re-gates: + {q_hll_merge, q_profile_sketch,
    // q_quantile_trim_sketch, q_quality_prune_sketch, q_pca,
    // q_word2vec} = 210, then the seeded-fit family
    // {q_ml_classification, q_ml_regression, q_cross_val,
    // q_als_recommend, q_kmeans_topics} = 215.
    // r15 closes the tail: the 3 ARIMA composites re-gated at their
    // verdict points {q_arima_gridsearch, q_forecast_cv, q_arima_css}
    // = 218 — every registered gate now carries a DuckDB oracle (the
    // raw float-fold MSEs stay spec-pinned; see the impossibility note
    // at the q_arima_css gate in WindowGates).
    // r16: + q_maxsim_rescore (exact-rescore over IVF candidates, the
    // guard-named path past the exact gate's pair-mass cap) = 219.
    // r17: + q_maxsim_rescore_adc (PQ-ADC top-m prune ahead of the exact
    // kernel — the IVFADC composition VERDICT r16 #3 asked for) = 220.
    assert(SparkEntry.queries.size == 220)
    assert(SparkEntry.oracleSql.size == 220)
  }
}
