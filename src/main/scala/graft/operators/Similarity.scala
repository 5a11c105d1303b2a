package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import org.apache.spark.sql.graft.VectorExpressions.floatDot

/** Similarity search over the `embeddings` table (brief north-star):
  * brute-force cosine top-k as the correctness baseline, IVF (coarse
  * centroid bucketing) as the scale path.
  *
  * Scale stance: the brute-force variant broadcasts the (small) QUERY set
  * against the full corpus — linear in corpus size, one pass, no shuffle
  * of the big side. The IVF variant buckets the corpus by nearest centroid
  * so each query only scans nprobe/K of the data — the standard ANN trade
  * at 100 TB. Per-vector norms are computed ONCE per side (not per pair),
  * and all dot products run through the codegen'd FloatDotProduct
  * expression — the interpreted zip_with/aggregate HOF fold was ~10×
  * slower on this path.
  */
object Similarity {

  /** Cosine similarity between two float-array columns (double math,
    * codegen'd). Prefer the precomputed-norm form below in joins. */
  def cosine(a: Column, b: Column): Column =
    floatDot(a, b) / (sqrt(floatDot(a, a)) * sqrt(floatDot(b, b)))

  /** Embeddings with a precomputed L2 norm column (`nrm`). */
  def withNorm(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .withColumn("nrm", sqrt(floatDot(col("embedding"), col("embedding"))))

  /** IVF coarse quantization: nearest-centroid bucket per vector, where
    * the centroids are the nCentroids lowest vec_ids (deterministic
    * seeds). One broadcast pass, no corpus shuffle. Shared by annIvf and
    * Dedup.embeddingNearDup so assignment semantics (rounding, tie-break)
    * stay in one place. Input must carry a `nrm` column (see withNorm). */
  def assignToNearestCentroid(e: DataFrame, nCentroids: Int): DataFrame = {
    val cents = e.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val wAssign = Window.partitionBy("vec_id").orderBy(col("c_sim_key").desc, col("c_id"))
    e.join(broadcast(cents))
      .withColumn("c_sim_key",
        round(floatDot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")), 6))
      .withColumn("c_rank", row_number().over(wAssign))
      .where(col("c_rank") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id").as("bucket"))
  }

  /** Brute-force cosine top-k: queries = vec_id < nQueries (broadcast),
    * corpus = all vectors. Ranking key is (round(cos,6) DESC, vec_id) so
    * the result is deterministic under floating-point ULP differences. */
  def cosineTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val e = withNorm(s, d)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", floatDot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("sim_key", round(col("cos"), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), round(col("cos"), 4).as("sim"))
  }

  /** IVF-style ANN: coarse-quantize the corpus onto nCentroids fixed seed
    * vectors (deterministic: the lowest vec_ids), assign every vector to
    * its nearest centroid (one broadcast pass), then answer queries by
    * probing only the nprobe nearest centroid buckets. At scale the
    * assignment is the only full pass; queries touch nprobe/nCentroids of
    * the corpus, and the bucketed corpus would be written
    * partitioned-by-centroid so probes prune partitions. */
  def annIvf(s: SparkSession, d: String, nCentroids: Int = 16, nprobe: Int = 2,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val e = withNorm(s, d)
    val cents = e.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val assigned = assignToNearestCentroid(e, nCentroids)

    // probe: each query's nprobe nearest centroids
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("p_sim_key").desc, col("c_id"))
    val probes = q.join(broadcast(cents))
      .withColumn("p_sim_key",
        round(floatDot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("p_rank", row_number().over(wProbe))
      .where(col("p_rank") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("c_id").as("bucket"))

    // search only within probed buckets
    val wTop = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", floatDot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("sim_key", round(col("cos"), 6))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("bucket"), col("rank"),
        round(col("cos"), 4).as("sim"))
  }
}
