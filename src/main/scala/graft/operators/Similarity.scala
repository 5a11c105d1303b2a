package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (brief north-star):
  * brute-force cosine top-k as the correctness baseline, IVF (coarse
  * centroid bucketing) as the scale path.
  *
  * Scale stance: the brute-force variant broadcasts the (small) QUERY set
  * against the full corpus — linear in corpus size, one pass, no shuffle
  * of the big side, per-partition top-k via TakeOrdered-style window
  * pruning. The IVF variant buckets the corpus by nearest centroid so each
  * query only scans nprobe/K of the data — the standard ANN trade at 100 TB.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in double
    * via SQL higher-order functions (zip_with/aggregate) — stays in the
    * JVM, no UDF. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) = aggregate(
      zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force cosine top-k: queries = vec_id < nQueries (broadcast),
    * corpus = all vectors. Ranking key is (round(cos,6) DESC, vec_id) so
    * the result is deterministic under floating-point ULP differences. */
  def cosineTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
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
    val e = Tables.embeddings(s, d)
    val cents = e.where(col("vec_id") < nCentroids)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))

    // assign: nearest centroid per vector (broadcast nested-loop over 16
    // centroids, then per-vector argmax — no corpus shuffle)
    val wAssign = Window.partitionBy("vec_id").orderBy(col("c_sim_key").desc, col("c_id"))
    val assigned = e.join(broadcast(cents))
      .withColumn("c_sim_key", round(cosine(col("embedding"), col("c_emb")), 6))
      .withColumn("c_rank", row_number().over(wAssign))
      .where(col("c_rank") === 1)
      .select(col("vec_id"), col("embedding"), col("c_id").as("bucket"))

    // probe: each query's nprobe nearest centroids
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("p_sim_key").desc, col("c_id"))
    val probes = q.join(broadcast(cents))
      .withColumn("p_sim_key", round(cosine(col("q_emb"), col("c_emb")), 6))
      .withColumn("p_rank", row_number().over(wProbe))
      .where(col("p_rank") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("c_id").as("bucket"))

    // search only within probed buckets
    val wTop = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("q_emb"), col("embedding")))
      .withColumn("sim_key", round(col("cos"), 6))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("bucket"), col("rank"),
        round(col("cos"), 4).as("sim"))
  }
}
