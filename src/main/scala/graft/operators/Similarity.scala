package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import org.apache.spark.sql.graft.VectorExpressions.floatDot

/** Static PQ kernels shared by training/encoding/search closures (top
  * level so Spark serializes only the call, not an enclosing object). */
object PqKernel {
  /** Index of the L2-nearest codeword; ties break to the lowest index. */
  def nearestL2(codewords: Array[Array[Float]], slice: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < codewords.length) {
      val cw = codewords(c)
      var dist = 0.0
      var i = 0
      while (i < slice.length) {
        val df = slice(i).toDouble - cw(i)
        dist += df * df
        i += 1
      }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }
}

/** THE nearest-centroid assignment kernel (top level so Spark serializes
  * only the static call, not an enclosing object): exact double cosine
  * against every centroid, strict `>` first-best scan — ties to the
  * lowest c_id, centroids pre-sorted ascending. ONE copy shared by
  * [[Similarity.assignWith]] and the label-carrying assignments in
  * [[Similarity.maxSimTopKRescore]] / [[Similarity.maxSimTopKRescoreAdc]]
  * (ADVICE r16 #2: two inline copies of this loop could drift, and the
  * q_ann_ivf / q_maxsim_rescore oracles both replay exactly this scan). */
object AssignKernel {
  def nearestCent(cs: Array[(Long, Array[Float], Double)], emb: Array[Float],
      nrm: Double): Long = {
    var bestId = -1L
    var bestSim = Double.NegativeInfinity
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      val cemb = c._2
      var dot = 0.0
      var k = 0
      while (k < emb.length) { dot += emb(k).toDouble * cemb(k).toDouble; k += 1 }
      val sim = dot / (nrm * c._3)
      if (sim > bestSim) { bestSim = sim; bestId = c._1 }
      i += 1
    }
    bestId
  }
}

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

  /** Centroid count for IVF bucketing: ≈√corpus (so expected bucket size
    * is also ≈√corpus — within-bucket pair space grows linearly with the
    * corpus, not quadratically), clamped to [4, 4096] so the centroid set
    * always stays broadcast-sized. Round-2's fixed 16 made buckets
    * ∝ corpus/16 — the one scale-killer VERDICT r2 flagged (item 5). */
  def centroidCount(corpusSize: Long): Int =
    math.max(4, math.min(4096, math.round(math.sqrt(corpusSize.toDouble)).toInt))

  /** A centroid: (stable id, vector, L2 norm). */
  type Cent = (Long, Array[Float], Double)

  // ---- ANN-family shared-build memos (r17 optimization round) ----------
  //
  // The similarity suite re-derived the SAME deterministic index pieces
  // per gate: the corpus count, the seed/Lloyd centroid arrays, the IVF
  // assignment pass, the PQ codebooks and code table, and the brute-force
  // ground-truth top-k — e.g. q_ivf_pq_recall re-ran q_ivf_pq_topk's
  // whole build+search, and four gates each paid their own brute-force
  // cosine corpus pass. A production deployment builds the index ONCE per
  // corpus snapshot and every query/audit session reads it (exactly the
  // argument `Memo`'s scaladoc makes for the dedup fixpoints); these
  // memos are that intermediate index. All builders are deterministic
  // (seeded centroids, vec_id-ordered sums), so every downstream oracle
  // hash is unchanged; bench/Verify attribute the one-time build to the
  // first caller via the [memo] stderr receipts.

  /** Memoized corpus row count — one count job per (session, dir). */
  private[graft] def embCount(s: SparkSession, d: String): Long =
    graft.Memo.cachedValue(s, s"emb_count:$d")(Tables.embeddings(s, d).count())

  /** Memoized seed centroids (the nc lowest vec_ids) for the dir corpus. */
  private def seedCentsD(s: SparkSession, d: String, nc: Int): Array[Cent] =
    graft.Memo.cachedValue(s, s"emb_seed_cents:$d:$nc")(
      seedCents(withNorm(s, d), nc))

  /** Memoized Lloyd-refined centroids for the dir corpus — shared by
    * annRecall's refined annIvf and the residual IVFADC family (both
    * refine the same seeds for 2 rounds). */
  private def refinedCentsD(s: SparkSession, d: String, nc: Int,
      iters: Int): Array[Cent] =
    graft.Memo.cachedValue(s, s"emb_refined_cents:$d:$nc:$iters")(
      refineCentroids(withNorm(s, d), nc, iters))

  /** Memoized seed-centroid IVF assignment over the dir corpus, CARRYING
    * the label column — the one corpus-wide assignment pass shared by
    * q_ann_ivf, q_maxsim_ivf, q_maxsim_rescore, q_maxsim_rescore_adc and
    * the q_ivf_pq_topk build (label-free consumers drop the column; the
    * kernel and centroid set are identical, so every assignment is
    * bit-equal to the per-gate passes this replaces). */
  private[graft] def memoAssigned(s: SparkSession, d: String): DataFrame = {
    val nc = centroidCount(embCount(s, d))
    graft.Memo.cached(s, s"ivf_assigned:$d:$nc") {
      import s.implicits._
      val bc = s.sparkContext.broadcast(seedCentsD(s, d, nc))
      withNorm(s, d)
        .select(col("vec_id"), col("label"), col("embedding"), col("nrm"))
        .as[(Long, Int, Array[Float], Double)]
        .map { case (id, lab, emb, nrm) =>
          (id, lab, emb, nrm, AssignKernel.nearestCent(bc.value, emb, nrm))
        }
        .toDF("vec_id", "label", "embedding", "nrm", "bucket")
    }
  }

  /** Memoized PQ codebooks over the RAW dir corpus (the q_ann_pq
    * parameterization) — shared by q_pq_topk, the q_ivf_pq_topk build
    * and q_maxsim_rescore_adc. Residual codebooks depend on the centroid
    * set and stay inside the (memoized) residual build. */
  private def pqBooks(s: SparkSession, d: String, m: Int, k: Int,
      iters: Int): Codebooks =
    graft.Memo.cachedValue(s, s"pq_books:$d:$m:$k:$iters")(
      pqTrain(Tables.embeddings(s, d), m, k, iters))

  /** Memoized PQ code table over the raw dir corpus. */
  private def memoCodes(s: SparkSession, d: String, m: Int, k: Int,
      iters: Int): DataFrame =
    graft.Memo.cached(s, s"pq_codes:$d:$m:$k:$iters")(
      pqEncode(Tables.embeddings(s, d), pqBooks(s, d, m, k, iters)))

  /** Deterministic centroid seeds: the nCentroids lowest vec_ids. */
  private def seedCents(e: DataFrame, nCentroids: Int): Array[Cent] = {
    val s = e.sparkSession
    import s.implicits._
    e.where(col("vec_id") < nCentroids)
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .as[Cent].collect().sortBy(_._1)
  }

  /** Deterministic Lloyd refinement of the seeded centroids: `iters`
    * rounds of assign-to-nearest + per-bucket mean. Seeds are poor
    * centroids (VERDICT r2) — a couple of Lloyd rounds moves them to
    * density centers and improves probe recall. Each round is one narrow
    * assignment pass + one shuffle of (bucket, vector) for the means —
    * the standard distributed k-means cost. Determinism: within-bucket
    * vectors are summed in vec_id order (double addition is
    * non-associative, so an unordered fold would drift across runs);
    * empty buckets keep their previous centroid. The mapGroups
    * materializes one bucket (≈√N vectors) per task — bounded by the
    * same argument that bounds the IVF bucket size. */
  def refineCentroids(e: DataFrame, nCentroids: Int, iters: Int): Array[Cent] =
    refineCentroids(e, nCentroids, iters, hier = false)

  /** [[refineCentroids]] with an opt-in hierarchical assignment pass
    * ([[assignWithHier]]) for large centroid sets — the Lloyd rounds
    * are where a linear-in-n centroid count would otherwise go
    * quadratic (see assignWithHier's scaladoc). */
  def refineCentroids(e: DataFrame, nCentroids: Int, iters: Int,
      hier: Boolean): Array[Cent] = {
    val s = e.sparkSession
    import s.implicits._
    // every round re-reads e (assignment pass + mean shuffle); cache for
    // the duration and release before returning — safe to own the
    // lifecycle here because all results are driver-side arrays, so
    // nothing lazy escapes that still depends on the cached plan
    val cached = e.cache()
    try {
      refineLoop(cached, nCentroids, iters, hier)
    } finally cached.unpersist()
  }

  private def refineLoop(e: DataFrame, nCentroids: Int, iters: Int,
      hier: Boolean = false): Array[Cent] = {
    val s = e.sparkSession
    import s.implicits._
    var cents = seedCents(e, nCentroids)
    for (_ <- 1 to iters) {
      val means = (if (hier) assignWithHier(e, cents) else assignWith(e, cents))
        .select(col("vec_id"), col("embedding"), col("bucket"))
        .as[(Long, Array[Float], Long)]
        .groupByKey(_._3)
        .mapGroups { (b, it) =>
          val rows = it.toArray.sortBy(_._1)
          val dim = rows.head._2.length
          val sum = new Array[Double](dim)
          rows.foreach { r =>
            var i = 0
            while (i < dim) { sum(i) += r._2(i); i += 1 }
          }
          val mean = Array.tabulate(dim)(i => (sum(i) / rows.length).toFloat)
          var n2 = 0.0
          var i = 0
          while (i < dim) { n2 += mean(i).toDouble * mean(i); i += 1 }
          (b, mean, math.sqrt(n2))
        }.collect()
      val byId = means.map(m => m._1 -> m).toMap
      cents = cents.map(c => byId.getOrElse(c._1, c))
    }
    cents
  }

  /** IVF coarse quantization: nearest-centroid bucket per vector, where
    * the centroids are the nCentroids lowest vec_ids (deterministic
    * seeds). The centroid set is small by construction (≤ 4096), so it is
    * collected once and shipped in the task closure: the assignment is a
    * single NARROW pass over the corpus — no N×C join row blow-up, no
    * shuffle (the round-2 window form shuffled N×C rows, which stops
    * being viable once C ≈ √N). Ties on the exact cosine break to the
    * lowest c_id (centroids scanned in ascending vec_id order). Shared by
    * annIvf and Dedup.embeddingNearDup so assignment semantics stay in
    * one place. Input must carry a `nrm` column (see withNorm). */
  def assignToNearestCentroid(e: DataFrame, nCentroids: Int): DataFrame =
    assignWith(e, seedCents(e, nCentroids))

  /** Assignment pass against an explicit centroid set (seeded or
    * Lloyd-refined): one narrow closure map, no shuffle. The scan itself
    * is [[AssignKernel.nearestCent]] — the single kernel every
    * assignment path shares (ADVICE r16 #2). */
  def assignWith(e: DataFrame, cents: Array[Cent]): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val bc = s.sparkContext.broadcast(cents)
    e.select(col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Array[Float], Double)]
      .map { case (id, emb, nrm) =>
        (id, emb, nrm, AssignKernel.nearestCent(bc.value, emb, nrm))
      }
      .toDF("vec_id", "embedding", "nrm", "bucket")
  }

  /** Two-level (coarse-routed) nearest-centroid assignment — the fix
    * for the quadratic trap [[assignWith]] walks into when the centroid
    * count GROWS WITH the corpus: at SemDeDup's production
    * parameterization (nClusters = n/targetSize) a flat scan costs
    * n·nc·dim = O(n²·dim/targetSize), and the round-11 sf30 run
    * measured exactly that (q_semdedup_linear 21.4 s at sf10 →
    * 207-226 s at sf30 ≈ the predicted 9×). Here the centroid set is
    * first grouped DRIVER-SIDE into ≈√nc coarse cells (lowest-id
    * centroids as coarse seeds — the seedCents scheme one level up);
    * each vector then scores the √nc coarse seeds, probes the top
    * `probes` cells, and scans only their members: O(√nc·(1+probes))
    * dots per vector instead of nc. The trade is the standard IVF one
    * — the true nearest centroid can hide in an unprobed cell (the
    * SemDedupSpec hier test measures agreement vs the flat scan) —
    * but IDENTICAL vectors follow identical probe paths, so the
    * exact-duplicates-co-cluster contract that SemDeDup's correctness
    * rests on is preserved by construction. Deterministic: fixed seed
    * choice, fixed scan order, strict `>` everywhere (first-best wins,
    * matching assignWith). */
  def assignWithHier(e: DataFrame, cents: Array[Cent], probes: Int = 8): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val ncc = math.max(1, math.ceil(math.sqrt(cents.length.toDouble)).toInt)
    val seeds = cents.sortBy(_._1).take(ncc)
    def simOf(a: Cent, b: Cent): Double = {
      var d = 0.0; var k = 0
      val x = a._2; val y = b._2
      while (k < x.length) { d += x(k).toDouble * y(k).toDouble; k += 1 }
      d / (a._3 * b._3)
    }
    // nc·√nc·dim driver flops — ≤ 4096·64·64 ≈ 1.7e7 at the broadcast
    // clamp, and nc/targetSize·√(nc)·dim ≈ 2.4e8 at sf30's 24k — cheap
    val groups = Array.fill(ncc)(scala.collection.mutable.ArrayBuffer.empty[Cent])
    cents.foreach { c =>
      var best = 0; var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < ncc) {
        val sim = simOf(c, seeds(i))
        if (sim > bestSim) { bestSim = sim; best = i }
        i += 1
      }
      groups(best) += c
    }
    val grouped = groups.map(_.toArray)
    val bcSeeds = s.sparkContext.broadcast(seeds)
    val bcGroups = s.sparkContext.broadcast(grouped)
    val p = math.min(probes, ncc)
    e.select(col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Array[Float], Double)]
      .map { case (id, emb, nrm) =>
        val sds = bcSeeds.value; val grp = bcGroups.value
        val sims = new Array[Double](sds.length)
        var i = 0
        while (i < sds.length) {
          val c = sds(i); val cemb = c._2
          var dot = 0.0; var k = 0
          while (k < emb.length) { dot += emb(k).toDouble * cemb(k).toDouble; k += 1 }
          sims(i) = dot / (nrm * c._3)
          i += 1
        }
        // top-p coarse cells, deterministic (sim desc, cell idx asc)
        val probeCells = new Array[Int](p)
        val taken = new Array[Boolean](sds.length)
        var t = 0
        while (t < p) {
          var best = -1; var bestSim = Double.NegativeInfinity
          var j = 0
          while (j < sims.length) {
            if (!taken(j) && sims(j) > bestSim) { bestSim = sims(j); best = j }
            j += 1
          }
          taken(best) = true; probeCells(t) = best; t += 1
        }
        var bestId = -1L
        var bestSim = Double.NegativeInfinity
        t = 0
        while (t < p) {
          val cell = grp(probeCells(t))
          var j = 0
          while (j < cell.length) {
            val c = cell(j); val cemb = c._2
            var dot = 0.0; var k = 0
            while (k < emb.length) { dot += emb(k).toDouble * cemb(k).toDouble; k += 1 }
            val sim = dot / (nrm * c._3)
            if (sim > bestSim) { bestSim = sim; bestId = c._1 }
            j += 1
          }
          t += 1
        }
        (id, emb, nrm, bestId)
      }
      .toDF("vec_id", "embedding", "nrm", "bucket")
  }

  /** Bound within-bucket pair space: buckets larger than maxBucket are
    * re-split by nearest SUB-centroid (the ⌈size/maxBucket⌉ lowest vec_ids
    * inside the bucket), the same deterministic-seed scheme as the first
    * level. Emits a `sub` column (0 everywhere no split triggered), so
    * downstream pair generation joins on (bucket, sub). The trade is the
    * usual blocking one — near-dups split across sub-buckets are missed;
    * near-IDENTICAL vectors keep landing together because their
    * sub-centroid similarities are near-identical (the recall contract
    * SimilaritySplitSpec pins). Nearest-centroid assignment bounds the
    * per-(bucket, sub) size in EXPECTATION, not adversarially — a bucket
    * whose vectors are all mutually near-identical cannot be split by any
    * locality-preserving scheme; a residual oversized sub is the signal to
    * raise nCentroids (more first-level buckets) instead.
    *
    * Driver footprint: only per-bucket COUNTS and the (few) sub-centroid
    * seed vectors are collected — both bounded by the oversized-bucket
    * count, never by corpus size; the seeds then ship in the task closure
    * exactly like the first-level centroids in [[assignWith]]. */
  def splitOversized(assigned: DataFrame, maxBucket: Int): DataFrame = {
    val s = assigned.sparkSession
    import s.implicits._
    val oversized = assigned.groupBy("bucket").count()
      .where(col("count") > maxBucket).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("count")).toMap
    if (oversized.isEmpty) return assigned.withColumn("sub", lit(0))
    val wSeed = Window.partitionBy("bucket").orderBy("vec_id")
    // per-bucket sub-count as a literal-map lookup (codegen'd), not a udf
    val nSubsByBucket = oversized.map { case (b, n) =>
      b -> math.ceil(n.toDouble / maxBucket).toInt
    }
    val subCents: Map[Long, Array[(Array[Float], Double)]] = assigned
      .where(col("bucket").isin(oversized.keys.toSeq: _*))
      .withColumn("rn", row_number().over(wSeed))
      .where(col("rn") <= element_at(typedlit(nSubsByBucket), col("bucket")))
      .select(col("bucket"), col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Long, Array[Float], Double)].collect()
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4))).toMap
    val bc = s.sparkContext.broadcast(subCents)
    assigned.select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
      .as[(Long, Array[Float], Double, Long)]
      .map { case (id, emb, nrm, bucket) =>
        val sub = bc.value.get(bucket) match {
          case None => 0
          case Some(cs) =>
            var best = 0
            var bestSim = Double.NegativeInfinity
            var i = 0
            while (i < cs.length) {
              val (cemb, cnrm) = cs(i)
              var dot = 0.0
              var k = 0
              while (k < emb.length) { dot += emb(k).toDouble * cemb(k).toDouble; k += 1 }
              val sim = dot / (nrm * cnrm)
              if (sim > bestSim) { bestSim = sim; best = i }
              i += 1
            }
            best
        }
        (id, emb, nrm, bucket, sub)
      }
      .toDF("vec_id", "embedding", "nrm", "bucket", "sub")
  }

  /** Symmetric int8 quantization of the embedding column — the standard
    * ANN storage trick (4× smaller vectors, SIMD-friendly int dot
    * products): per-vector scale = max |x|, q_i = round(x_i/scale·127)
    * ∈ [-127, 127]; dequantize as q_i·scale/127. Pure per-row array
    * expressions (no shuffle); the gate output reports the scale, the
    * quantized checksum, and the max reconstruction error instead of the
    * int8 array itself so the oracle hash stays type-stable. The reported
    * doubles are RAW, not rounded: scale is an exact float→double
    * conversion and max_abs_err is built from IEEE ops evaluated in the
    * same order on both engines, so they compare bit-exact — whereas a
    * round(x, 6) decorates them with engine-specific decimal-rounding
    * (BigDecimal HALF_UP vs FP-multiply), the one cross-engine hazard
    * ADVICE r5 flagged here. Zero vectors
    * quantize to all-zero with scale 0. At 100 TB the quantized corpus
    * would be written alongside the IVF bucket assignment and probed with
    * int arithmetic, re-ranking survivors against the float originals. */
  def quantizeInt8(s: SparkSession, d: String): DataFrame =
    quantizeInt8Vecs(Tables.embeddings(s, d))

  /** [[quantizeInt8]] over an arbitrary (vec_id, embedding) frame. */
  def quantizeInt8Vecs(e: DataFrame): DataFrame = {
    val scale = expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))")
    e.withColumn("scale", scale)
      .withColumn("q", expr(
        """CASE WHEN scale = 0.0 THEN transform(embedding, x -> CAST(0 AS BIGINT))
          |ELSE transform(embedding,
          |  x -> CAST(round(CAST(x AS DOUBLE) / scale * 127.0) AS BIGINT)) END""".stripMargin))
      .withColumn("max_abs_err", expr(
        """CASE WHEN scale = 0.0 THEN CAST(0.0 AS DOUBLE)
          |ELSE array_max(zip_with(embedding, q,
          |  (x, qi) -> abs(CAST(x AS DOUBLE) - qi * scale / 127.0))) END""".stripMargin))
      .select(col("vec_id"), col("scale"),
        expr("aggregate(q, CAST(0 AS BIGINT), (a, b) -> a + b)").as("q_sum"),
        expr("array_min(q)").cast("long").as("q_min"),
        expr("array_max(q)").cast("long").as("q_max"),
        col("max_abs_err"))
  }

  /** Per-subspace PQ codebooks: (sub)(code) → codeword slice. */
  type Codebooks = Array[Array[Array[Float]]]

  /** Deterministic product-quantization training (Jégou et al. 2011,
    * "Product Quantization for Nearest Neighbor Search"): split the
    * embedding into m equal subspaces and learn k codewords per subspace
    * by Lloyd iterations seeded from the k lowest vec_ids' slices — the
    * same deterministic-seed + vec_id-ordered-sum scheme as
    * [[refineCentroids]], so training is bit-reproducible. One job per
    * iteration covers ALL subspaces (each vector emits m (sub, code,
    * slice) assignments; per-(sub, code) means are a bounded mapGroups).
    * The full codebook set is m·k·(dim/m) floats = k·dim — driver-sized
    * by construction, broadcast for encoding. */
  def pqTrain(e: DataFrame, m: Int = 4, k: Int = 16, iters: Int = 3,
      seedSkip: Long = 0L): Codebooks = {
    val s = e.sparkSession
    import s.implicits._
    val vecs = e.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
    val dim = vecs.head()._2.length
    require(dim % m == 0, s"dim=$dim not divisible by m=$m subspaces")
    val d = dim / m
    // seedSkip: lowest vec_id eligible as a Lloyd seed. Residual callers
    // pass the coarse-centroid count — vec_ids below it ARE the centroids,
    // whose residuals are exactly zero, and k identical zero seeds make
    // Lloyd collapse to one effective codeword (nearestL2 ties break to
    // index 0, so only codeword 0 ever receives points or updates).
    val seeds = vecs.where(col("vec_id") >= seedSkip)
      .orderBy("vec_id").limit(k).collect().sortBy(_._1).map(_._2)
    require(seeds.length == k, s"need at least k=$k vectors to seed PQ")
    var books: Codebooks =
      Array.tabulate(m)(sub => seeds.map(_.slice(sub * d, (sub + 1) * d)))
    val cached = vecs.cache()
    try {
      for (_ <- 1 to iters) {
        val bc = s.sparkContext.broadcast(books)
        val means = cached
          .flatMap { case (id, emb) =>
            val bk = bc.value
            (0 until m).iterator.map { sub =>
              val slice = emb.slice(sub * d, (sub + 1) * d)
              ((sub, PqKernel.nearestL2(bk(sub), slice)), (id, slice))
            }
          }
          .groupByKey(_._1)
          .mapGroups { (key, it) =>
            val rows = it.toArray.sortBy(_._2._1) // vec_id order: exact sums
            val sum = new Array[Double](d)
            rows.foreach { r =>
              var i = 0
              while (i < d) { sum(i) += r._2._2(i); i += 1 }
            }
            (key._1, key._2, Array.tabulate(d)(i => (sum(i) / rows.length).toFloat))
          }
          .collect()
        val next = books.map(_.clone())
        means.foreach { case (sub, code, mean) => next(sub)(code) = mean }
        books = next
      }
      books
    } finally cached.unpersist()
  }

  /** Encode every vector to its m sub-codes — one narrow broadcast pass,
    * 4 bits·log2(k)/8 bytes per vector instead of 4·dim: the PQ storage
    * win that makes billion-vector search fit in memory. */
  def pqEncode(e: DataFrame, books: Codebooks): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val m = books.length
    val d = books(0)(0).length
    val bc = s.sparkContext.broadcast(books)
    e.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, emb) =>
        val bk = bc.value
        (id, Array.tabulate(m)(sub =>
          PqKernel.nearestL2(bk(sub), emb.slice(sub * d, (sub + 1) * d))))
      }
      .toDF("vec_id", "codes")
  }

  /** PQ-ADC top-k (asymmetric distance computation): per query, a m×k
    * table of exact dot products against every codeword — k·dim mults,
    * built once per query — turns each corpus vector's score into m table
    * lookups over its CODES. The corpus pass touches codes only (the
    * 4-byte-ish encoded form), never the float vectors: the scan cost at
    * 100 TB is the encoded corpus, ~dim/m-fold smaller. Deterministic
    * ranking via (round(score, 6) DESC, vec_id), the same ULP-proof rank
    * key as [[cosineTopK]]. DuckDB-oracled since r13 (OracleCtes.pqCtes
    * unrolls the three training rounds, the L2-argmin encode, and the
    * ADC tables); PqSpec additionally pins determinism, code locality,
    * and ADC-vs-exact recall on separable clusters. */
  def pqTopK(s: SparkSession, d: String, m: Int = 4, k: Int = 16,
      nQueries: Int = 10, topK: Int = 5, iters: Int = 3): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d)
    // codebooks + code table ride the session memo shared with the
    // q_ivf_pq_topk build and q_maxsim_rescore_adc (identical training)
    val books = pqBooks(s, d, m, k, iters)
    val codes = memoCodes(s, d, m, k, iters)
    val queries = e.where(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().sortBy(_._1)
    val dSub = books(0)(0).length
    // per-query ADC tables: (q_id, table(sub)(code) = <q_slice, codeword>)
    val tables: Array[(Long, Array[Array[Double]])] = queries.map { case (qid, q) =>
      qid -> Array.tabulate(m) { sub =>
        val slice = q.slice(sub * dSub, (sub + 1) * dSub)
        books(sub).map(cw => PqKernel.dot(slice, cw))
      }
    }
    val bc = s.sparkContext.broadcast(tables)
    val scored = codes.as[(Long, Array[Int])]
      .flatMap { case (id, cs) =>
        bc.value.iterator.filter(_._1 != id).map { case (qid, tab) =>
          var sc = 0.0
          var sub = 0
          while (sub < cs.length) { sc += tab(sub)(cs(sub)); sub += 1 }
          (qid, id, sc)
        }
      }
      .toDF("q_id", "vec_id", "score")
    val w = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    scored
      .withColumn("sim_key", round(col("score"), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("q_id"), col("vec_id"), col("rank"), col("sim_key").as("adc_score"))
  }

  /** IVF-PQ: the composition the two halves exist for (FAISS's
    * workhorse index) — coarse IVF bucketing prunes the corpus to nprobe
    * buckets per query, and within the probed buckets the score is
    * PQ-ADC over the ENCODED corpus. The full pass over float vectors
    * happens exactly twice at build time (assignment + encoding); search
    * touches nprobe/√N of the corpus and reads only codes. This variant
    * encodes raw vectors, not residuals (vector − centroid): simpler, a
    * known recall trade, documented rather than hidden. DuckDB-oracled
    * since r13 (seed-centroid probes + the pqCtes chain); PqSpec pins
    * probed-bucket containment, own-cluster recall, and determinism. */
  def ivfPqTopK(s: SparkSession, d: String, nCentroids: Int = 0, nprobe: Int = 2,
      m: Int = 4, k: Int = 16, nQueries: Int = 10, topK: Int = 5,
      iters: Int = 3, refineIters: Int = 0): DataFrame =
    // result memo (r17): q_ivf_pq_recall re-ran this ENTIRE build+search
    // after q_ivf_pq_topk already produced the identical frame — the
    // audit now reads the same searched index the gate emits, the
    // production shape (one index build, many readers)
    graft.Memo.cached(s, s"ivf_pq_topk:$d:$nCentroids:$nprobe:$m:$k:" +
        s"$nQueries:$topK:$iters:$refineIters")(
      ivfPqTopKBuild(s, d, nCentroids, nprobe, m, k, nQueries, topK, iters,
        refineIters))

  private[graft] def ivfPqTopKBuild(s: SparkSession, d: String, nCentroids: Int,
      nprobe: Int, m: Int, k: Int, nQueries: Int, topK: Int,
      iters: Int, refineIters: Int): DataFrame = {
    import s.implicits._
    val e = withNorm(s, d)
    val nc = if (nCentroids > 0) nCentroids else centroidCount(embCount(s, d))
    val cents =
      if (refineIters > 0) refinedCentsD(s, d, nc, refineIters)
      else seedCentsD(s, d, nc)
    // seed-centroid default rides the suite-shared assignment + PQ memos
    val assigned = if (refineIters == 0 && nCentroids == 0)
      memoAssigned(s, d).select("vec_id", "bucket")
    else assignWith(e, cents).select("vec_id", "bucket")
    val books = pqBooks(s, d, m, k, iters)
    val codes = memoCodes(s, d, m, k, iters)
    val corpus = assigned.join(codes, Seq("vec_id"))
    val queries = e.where(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
    val dSub = books(0)(0).length
    // driver-side probe selection + ADC tables: both bounded by
    // (nQueries × centroid count) and (nQueries × m × k)
    val plans: Array[(Long, Set[Long], Array[Array[Double]])] = queries.map {
      case (qid, q, qn) =>
        val probed = cents
          .map(c => (c._1, PqKernel.dot(q, c._2) / (qn * c._3)))
          .sortBy { case (cid, sim) => (-sim, cid) }
          .take(nprobe).map(_._1).toSet
        val table = Array.tabulate(m) { sub =>
          val slice = q.slice(sub * dSub, (sub + 1) * dSub)
          books(sub).map(cw => PqKernel.dot(slice, cw))
        }
        (qid, probed, table)
    }
    val bc = s.sparkContext.broadcast(plans)
    val scored = corpus.as[(Long, Long, Array[Int])]
      .flatMap { case (id, bucket, cs) =>
        bc.value.iterator
          .filter { case (qid, probed, _) => qid != id && probed.contains(bucket) }
          .map { case (qid, _, tab) =>
            var sc = 0.0
            var sub = 0
            while (sub < cs.length) { sc += tab(sub)(cs(sub)); sub += 1 }
            (qid, id, bucket, sc)
          }
      }
      .toDF("q_id", "vec_id", "bucket", "score")
    val w = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    scored
      .withColumn("sim_key", round(col("score"), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("q_id"), col("vec_id"), col("bucket"), col("rank"),
        col("sim_key").as("adc_score"))
  }

  /** Per-vector residuals against an explicit centroid set: emit
    * (vec_id, residual embedding, bucket) where residual = v − c_bucket.
    * One narrow broadcast pass, same shape as [[assignWith]]. The
    * residual is what IVFADC (Jégou et al. 2011 §IV) quantizes: residual
    * magnitudes are much smaller than vector magnitudes, so the same
    * codebook budget spends its resolution where the information is. */
  def residualsOf(e: DataFrame, cents: Array[Cent]): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    val byId = cents.map(c => c._1 -> c._2).toMap
    val bc = s.sparkContext.broadcast(byId)
    assignWith(e, cents)
      .select(col("vec_id"), col("embedding"), col("bucket"))
      .as[(Long, Array[Float], Long)]
      .map { case (id, emb, bucket) =>
        val c = bc.value(bucket)
        val r = new Array[Float](emb.length)
        var i = 0
        while (i < emb.length) { r(i) = emb(i) - c(i); i += 1 }
        (id, r, bucket)
      }
      .toDF("vec_id", "embedding", "bucket")
  }

  /** IVF-PQ with RESIDUAL encoding — the IVFADC composition proper:
    * codebooks are trained on (vector − coarse centroid) residuals and
    * each vector's codes quantize its residual. Search exploits
    * q·v ≈ q·c_b + q·r̂_v: the per-bucket constant q·c_b is exact (the
    * probe pass already computes q against every centroid), and the ADC
    * table over residual codewords is built ONCE per query — same m
    * lookups per corpus vector as the raw variant, so the scan cost is
    * identical and only the quantization error shrinks (residuals are
    * small, so the same k codewords cover them finer). The measured
    * delta vs the raw variant is `ivfPqRecall(residual = true/false)`;
    * AnnRecallSpec pins residual ≥ raw. Build passes over float vectors:
    * assignment + residual + encode — same two-scan class as the raw
    * form (residual fuses into assignment). */
  def ivfPqResidualTopK(s: SparkSession, d: String, nCentroids: Int = 0,
      nprobe: Int = 2, m: Int = 4, k: Int = 16, nQueries: Int = 10,
      topK: Int = 5, iters: Int = 3, refineIters: Int = 2): DataFrame =
    // result memo (r17): q_ivf_pq_recall_res re-ran this entire
    // build+search after q_ivf_pq_topk_res — same one-index-many-readers
    // argument as the raw twin above
    graft.Memo.cached(s, s"ivf_pq_res_topk:$d:$nCentroids:$nprobe:$m:$k:" +
        s"$nQueries:$topK:$iters:$refineIters")(
      ivfPqResidualTopKBuild(s, d, nCentroids, nprobe, m, k, nQueries, topK,
        iters, refineIters))

  private[graft] def ivfPqResidualTopKBuild(s: SparkSession, d: String,
      nCentroids: Int, nprobe: Int, m: Int, k: Int, nQueries: Int,
      topK: Int, iters: Int, refineIters: Int): DataFrame = {
    import s.implicits._
    val e = withNorm(s, d)
    val nc = if (nCentroids > 0) nCentroids else centroidCount(embCount(s, d))
    // IVFADC presumes a TRAINED coarse quantizer: residuals against raw
    // seed vectors average LARGER than the unit vectors themselves
    // (measured 1.18 vs 1.00 at sf0.001), inverting the whole premise —
    // Lloyd-refined centroids are bucket means, so residuals shrink to
    // the within-bucket spread (0.93 measured). refineIters = 0 exists
    // only for controlled raw-vs-residual experiments. The refined set
    // rides the session memo shared with q_ann_recall's refined probe.
    val cents =
      if (refineIters > 0) refinedCentsD(s, d, nc, refineIters)
      else seedCentsD(s, d, nc)
    val residuals = residualsOf(e, cents)
    // no explicit cache: pqTrain owns a cache of its input for the Lloyd
    // rounds (see pqTrain), and the one extra residual recompute for the
    // encode pass is a narrow map — the same lifecycle as the raw variant
    val books = pqTrain(residuals.select("vec_id", "embedding"), m, k, iters,
      seedSkip = nc)
    val codes = pqEncode(residuals.select("vec_id", "embedding"), books)
    val corpus = residuals.select("vec_id", "bucket").join(codes, Seq("vec_id"))
    val queries = e.where(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Array[Float], Double)].collect().sortBy(_._1)
    val dSub = books(0)(0).length
    // per-query probe plan: probed buckets, the exact q·c_b constants,
    // and ONE residual-ADC table (independent of the bucket)
    val plans: Array[(Long, Map[Long, Double], Array[Array[Double]])] =
      queries.map { case (qid, q, qn) =>
        val sims = cents.map(c => (c._1, PqKernel.dot(q, c._2), PqKernel.dot(q, c._2) / (qn * c._3)))
        val probed = sims.sortBy { case (cid, _, sim) => (-sim, cid) }
          .take(nprobe).map(p => p._1 -> p._2).toMap
        val table = Array.tabulate(m) { sub =>
          val slice = q.slice(sub * dSub, (sub + 1) * dSub)
          books(sub).map(cw => PqKernel.dot(slice, cw))
        }
        (qid, probed, table)
      }
    val bc = s.sparkContext.broadcast(plans)
    val scored = corpus.as[(Long, Long, Array[Int])]
      .flatMap { case (id, bucket, cs) =>
        bc.value.iterator
          .filter { case (qid, probed, _) => qid != id && probed.contains(bucket) }
          .map { case (qid, probed, tab) =>
            var sc = probed(bucket)
            var sub = 0
            while (sub < cs.length) { sc += tab(sub)(cs(sub)); sub += 1 }
            (qid, id, bucket, sc)
          }
      }
      .toDF("q_id", "vec_id", "bucket", "score")
    val w = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    val out = scored
      .withColumn("sim_key", round(col("score"), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= topK)
      .select(col("q_id"), col("vec_id"), col("bucket"), col("rank"),
        col("sim_key").as("adc_score"))
    out
  }

  /** Measured ANN quality gate: recall@k of [[annIvf]] (Lloyd-refined
    * centroids by default) against the brute-force [[cosineTopK]] ground
    * truth, one row per query — the number that decides whether an ANN
    * configuration is shippable, produced by the engine itself instead of
    * asserted in prose. Both sides rank by the same (round(cos,6) DESC,
    * vec_id) key, so recall differences measure BUCKETING loss only.
    * Deterministic (seeded centroids + vec_id-ordered Lloyd sums) AND
    * SQL-replayable since r13 (OracleCtes.lloydCtes unrolls the two
    * refinement rounds — the SemDeDup device); AnnRecallSpec pins
    * the floor and the refined-beats-seeds ordering. Cost shape: ground
    * truth is one broadcast-queries corpus pass — the same pass a
    * production recall audit runs on a SAMPLE of queries next to the
    * index build. */
  def annRecall(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      nprobe: Int = 2, refineIters: Int = 2): DataFrame = {
    val truth = cosineTopK(s, d, nQueries, k)
      .select(col("q_id"), col("vec_id"))
    val got = annIvf(s, d, nprobe = nprobe, nQueries = nQueries, k = k,
      refineIters = refineIters)
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    truth.join(got, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k_truth"),
        coalesce(sum("hit"), lit(0L)).as("n_hits"))
      .withColumn("recall_at_k", col("n_hits").cast("double") / col("k_truth"))
  }

  /** Exact top-k by RAW DOT PRODUCT — the ground truth whose metric
    * matches what PQ-ADC approximates (ADC scores are unnormalized
    * dot products, so cosine truth would conflate metric mismatch with
    * quantization loss). Same broadcast-queries/one-corpus-pass shape and
    * the same deterministic rank key discipline as [[cosineTopK]]. */
  def dotTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5): DataFrame =
    graft.Memo.cached(s, s"dot_topk:$d:$nQueries:$k")(
      dotTopKBuild(s, d, nQueries, k))

  /** [[dotTopK]]'s corpus pass — memoized above because BOTH PQ recall
    * gates (raw and residual) audit against the identical ground truth. */
  private[graft] def dotTopKBuild(s: SparkSession, d: String, nQueries: Int,
      k: Int): DataFrame = {
    val e = Tables.embeddings(s, d)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("sim_key", round(floatDot(col("q_emb"), col("embedding")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"))
  }

  /** Recall@k of [[ivfPqTopK]] (ADC over codes within probed buckets)
    * against the exact-dot [[dotTopK]] ground truth — the measured number
    * for the two stacked approximations (IVF pruning + PQ encoding) that
    * `ivfPqTopK`'s scaladoc could only describe as "a documented recall
    * trade". One row per query; `residual = true` measures the IVFADC
    * residual-encoding variant instead, so the raw-vs-residual trade is
    * a pair of numbers, not prose. DuckDB-oracled since r13 (both top-k
    * chains replayed verbatim against the exact-dot truth);
    * AnnRecallSpec pins the floors and the residual ≥ raw ordering. */
  def ivfPqRecall(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 5,
      nprobe: Int = 2, m: Int = 4, codebookK: Int = 16,
      residual: Boolean = false, refineIters: Int = -1): DataFrame = {
    val truth = dotTopK(s, d, nQueries, k)
      .select(col("q_id"), col("vec_id"))
    // refineIters = -1 means "the variant's own default" (raw ships
    // seeds, residual ships a trained coarse quantizer); pass an explicit
    // value to hold the coarse quantizer fixed across a comparison
    val approx =
      if (residual) ivfPqResidualTopK(s, d, nprobe = nprobe, m = m,
        k = codebookK, nQueries = nQueries, topK = k,
        refineIters = if (refineIters >= 0) refineIters else 2)
      else ivfPqTopK(s, d, nprobe = nprobe, m = m, k = codebookK,
        nQueries = nQueries, topK = k,
        refineIters = if (refineIters >= 0) refineIters else 0)
    val got = approx
      .select(col("q_id"), col("vec_id"), lit(1L).as("hit"))
    truth.join(got, Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k_truth"),
        coalesce(sum("hit"), lit(0L)).as("n_hits"))
      .withColumn("recall_at_k", col("n_hits").cast("double") / col("k_truth"))
  }

  /** Brute-force cosine top-k: queries = vec_id < nQueries (broadcast),
    * corpus = all vectors. Ranking key is (round(cos,6) DESC, vec_id) so
    * the result is deterministic under floating-point ULP differences.
    *
    * Suite-shared (r17): FOUR gates paid this corpus pass — q_cosine_topk
    * itself, q_ann_recall's and q_mrl_recall's ground truths (k = 5) and
    * q_hybrid_rrf's dense list (nQueries = 5, k = 20). One memoized build
    * at (nQueries = 10, k = 20) now serves all of them: per-query rank is
    * independent of k and of which OTHER queries run, so filtering the
    * canonical build to (q_id < nQueries, rank ≤ k) is row-identical to a
    * direct build — callers outside the canonical envelope fall through
    * to the direct form. */
  def cosineTopK(s: SparkSession, d: String, nQueries: Int = 10, k: Int = 10): DataFrame =
    if (nQueries <= CosineMemoQ && k <= CosineMemoK)
      graft.Memo.cached(s, s"cosine_topk:$d:q=$CosineMemoQ:k=$CosineMemoK")(
        cosineTopKBuild(s, d, CosineMemoQ, CosineMemoK))
        .where(col("q_id") < nQueries && col("rank") <= k)
    else cosineTopKBuild(s, d, nQueries, k)

  /** Canonical memo envelope: covers every gate caller (10 queries, top
    * 20) while keeping the checkpointed frame top-k-bounded. */
  private val CosineMemoQ = 10
  private val CosineMemoK = 20

  private[graft] def cosineTopKBuild(s: SparkSession, d: String, nQueries: Int,
      k: Int): DataFrame = {
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

  /** Contrastive-pair mining over the LABELED embedding corpus: for each
    * anchor, its top-k SAME-label neighbors (positives) and top-k
    * DIFFERENT-label nearest neighbors (hard negatives — the
    * semantically closest wrong-class examples, exactly the pairs a
    * contrastive/metric-learning fine-tune wants in its batches). Same
    * plan as [[cosineTopK]]: corpus streamed once, anchors broadcast,
    * one window over (anchor, pair_type) with the deterministic
    * (round(cos, 6) DESC, vec_id) ranking — fully oracle-able. At
    * 100 TB the anchor set rides the IVF index ([[annIvf]]) instead of
    * the brute-force scan; the mining logic (label split + per-type
    * top-k) is unchanged. */
  def hardNegatives(s: SparkSession, d: String, nQueries: Int = 10,
      k: Int = 3): DataFrame = {
    val e = withNorm(s, d)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("label").as("q_label"))
    val w = Window.partitionBy("q_id", "pair_type")
      .orderBy(col("sim_key").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("pair_type",
        when(col("label") === col("q_label"), "positive")
          .otherwise("hard_negative"))
      .withColumn("cos",
        floatDot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("sim_key", round(col("cos"), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("pair_type"), col("rank"), col("vec_id"),
        col("label"), round(col("cos"), 4).as("sim"))
  }

  /** Matryoshka-style truncation trade, measured: recall@k of brute-force
    * cosine over the FIRST `dim` embedding components against the
    * full-dimension ground truth, one row per (trunc_dim, query). The
    * number behind "store/search the 16-dim prefix, re-rank with the full
    * vector" — at 100 TB, prefix search reads dim/D of the vector bytes
    * (columnar layouts can even prune the tail pages), and this query
    * says exactly what that buys and costs. Every pass is the
    * [[cosineTopK]] shape: corpus streamed once per dim, queries
    * broadcast, (round(cos, 6) DESC, vec_id) deterministic ranking —
    * fully oracle-able, unlike the Lloyd-fit recalls. Truncated slices
    * are NOT unit-norm, so cosine renormalizes per slice. */
  def mrlRecall(s: SparkSession, d: String, dims: Seq[Int] = Seq(8, 16, 32),
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val full = Tables.embeddings(s, d)
    def topkAt(sliced: DataFrame): DataFrame = {
      val e = sliced
        .withColumn("nrm", sqrt(floatDot(col("embedding"), col("embedding"))))
      val q = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      val w = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cos",
          floatDot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
        .withColumn("sim_key", round(col("cos"), 6))
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= k)
        .select(col("q_id"), col("vec_id"))
    }
    // full-dim truth = the memoized brute-force cosine top-k (identical
    // window key and self-exclusion — r17: one corpus pass serves
    // q_cosine_topk, both recall truths and q_hybrid_rrf's dense list);
    // nQueries·k rows, so the |dims| recall joins read a tiny frame
    val truth = cosineTopK(s, d, nQueries, k).select("q_id", "vec_id")
      .localCheckpoint()
    dims.map { dim =>
      val got = topkAt(full.select(col("vec_id"),
          slice(col("embedding"), 1, dim).as("embedding")))
        .withColumn("hit", lit(1L))
      truth.join(got, Seq("q_id", "vec_id"), "left")
        .groupBy("q_id")
        .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / k)
          .as("recall_at_k"))
        .withColumn("trunc_dim", lit(dim))
    }.reduce(_ unionByName _)
      .select("trunc_dim", "q_id", "recall_at_k")
  }

  /** IVF-style ANN: coarse-quantize the corpus onto ≈√N fixed seed
    * vectors (deterministic: the lowest vec_ids; nCentroids = 0 means
    * auto-scale via centroidCount), assign every vector to its nearest
    * centroid (one narrow closure pass), then answer queries by probing
    * only the nprobe nearest centroid buckets. At scale the assignment is
    * the only full pass; queries touch ≈ nprobe/√N of the corpus, and the
    * bucketed corpus would be written partitioned-by-centroid so probes
    * prune partitions. */
  def annIvf(s: SparkSession, d: String, nCentroids: Int = 0, nprobe: Int = 2,
      nQueries: Int = 10, k: Int = 5, refineIters: Int = 0): DataFrame = {
    import s.implicits._
    val e = withNorm(s, d)
    val nc = if (nCentroids > 0) nCentroids else centroidCount(embCount(s, d))
    // refineIters > 0 swaps the seed centroids for Lloyd-refined ones —
    // better recall, same plan; the gate query keeps 0 so the DuckDB
    // oracle (which re-derives the seed assignment in SQL) stays exact.
    // Both centroid sets ride the session memo (the refined set is the
    // SAME 2-round Lloyd the residual IVFADC family trains).
    val centArr = if (refineIters > 0) refinedCentsD(s, d, nc, refineIters)
      else seedCentsD(s, d, nc)
    val cents = centArr.toSeq.toDF("c_id", "c_emb", "c_nrm")
    // the seed-centroid default shares the suite-wide assignment pass
    // (label dropped — assignment is bit-equal by the shared kernel)
    val assigned = if (refineIters == 0 && nCentroids == 0)
      memoAssigned(s, d).drop("label")
    else assignWith(e, centArr)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    ivfSearch(cents, assigned, q, nprobe, k)
  }

  /** The IVF probe + bucket-search stage, shared by [[annIvf]] (in-memory
    * index) and [[annIvfIndexIO]] (index reloaded from parquet) so the
    * two paths can never drift: probe each query's nprobe nearest
    * centroids, then search only the probed buckets. */
  private def ivfSearch(cents: DataFrame, assigned: DataFrame, q: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
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

  /** Persist the IVF index: the broadcast-sized centroid table and the
    * bucket-assigned posting vectors, each as parquet under `path`. This
    * is the build-once/query-many lifecycle a production vector index
    * needs — at 100 TB the assignment pass (the expensive map over every
    * vector) runs once per corpus snapshot and every query session reads
    * the postings back partitioned by bucket, instead of re-deriving the
    * index per session. Floats round-trip parquet bit-exactly, so a
    * reloaded index answers IDENTICALLY to the in-memory one
    * (AnnRecallSpec pins equality; the gate row shares q_ann_ivf's
    * DuckDB oracle for the same reason). */
  def ivfIndexSave(s: SparkSession, d: String, path: String,
      nCentroids: Int = 0): Unit = {
    import s.implicits._
    val nc = if (nCentroids > 0) nCentroids else centroidCount(embCount(s, d))
    val centArr = if (nCentroids > 0) seedCents(withNorm(s, d), nCentroids)
      else seedCentsD(s, d, nc)
    centArr.toSeq.toDF("c_id", "c_emb", "c_nrm")
      .write.mode("overwrite").parquet(s"$path/centroids")
    // the gate's contract is the save/reload identity, not the assignment
    // pass — the default parameterization writes the suite-shared
    // assignment (bit-equal by the shared kernel)
    (if (nCentroids > 0) assignWith(withNorm(s, d), centArr)
     else memoAssigned(s, d).drop("label"))
      .repartition(col("bucket")) // postings co-located by bucket on disk
      .write.mode("overwrite").parquet(s"$path/postings")
  }

  /** q_ann_index_io gate: save the IVF index to parquet, reload it, and
    * answer the same top-k queries as q_ann_ivf through [[ivfSearch]] —
    * result must be IDENTICAL to the in-memory path (it shares
    * q_ann_ivf's oracle). */
  def annIvfIndexIO(s: SparkSession, d: String, nprobe: Int = 2,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    val path = graft.Scratch.dir(s"ivf_$d")
    ivfIndexSave(s, d, path)
    val cents = s.read.parquet(s"$path/centroids")
    val assigned = s.read.parquet(s"$path/postings")
    val q = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    ivfSearch(cents, assigned, q, nprobe, k)
  }

  /** Incremental IVF index MAINTENANCE — the build-once/append-many
    * lifecycle that keeps a 100 TB vector index usable between full
    * rebuilds: the base corpus builds and persists the index with a
    * capacity-planned centroid count (centroids are FROZEN at build
    * time), and a later ingest batch pays ONE assignment pass over just
    * the new vectors, appended to the bucket-partitioned postings — the
    * base postings are never rewritten. Because the centroids are
    * byte-identical to what a full rebuild over base+batch would seed
    * (lowest-id seeds live in the base half) and assignment is
    * per-vector, the appended index answers IDENTICALLY to q_ann_ivf's
    * one-shot build — the gate shares AnnIvfOracle, and IvfAppendSpec
    * pins bit-equality against [[annIvf]]. */
  def annIvfIndexAppend(s: SparkSession, d: String, nprobe: Int = 2,
      nQueries: Int = 10, k: Int = 5): DataFrame = {
    import s.implicits._
    val path = graft.Scratch.dir(s"ivf_append_$d")
    val e = withNorm(s, d)
    val n = embCount(s, d)
    val nc = centroidCount(n)
    // capacity planning: the frozen centroid count reflects the corpus
    // the index will GROW to, not the base batch it starts from
    val splitAt = math.max(n / 2, nc.toLong)
    val base = e.where(col("vec_id") < splitAt)
    val batch = e.where(col("vec_id") >= splitAt)
    // the lowest-id seeds live in the base half (splitAt >= nc), so the
    // base seeds ARE the suite-shared corpus seeds
    val centArr = seedCentsD(s, d, nc)
    centArr.toSeq.toDF("c_id", "c_emb", "c_nrm")
      .write.mode("overwrite").parquet(s"$path/centroids")
    assignWith(base, centArr).repartition(col("bucket"))
      .write.mode("overwrite").parquet(s"$path/postings")
    // the incremental step: assign ONLY the new batch, append its postings
    assignWith(batch, centArr).repartition(col("bucket"))
      .write.mode("append").parquet(s"$path/postings")
    val cents = s.read.parquet(s"$path/centroids")
    val assigned = s.read.parquet(s"$path/postings")
    val q = assigned.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    ivfSearch(cents, assigned, q, nprobe, k)
  }

  /** Reshape a 64-d embedding into 8 token-vectors × 8 dims with each
    * component quantized to `floor(x · 10⁴)` as LONG — the
    * multi-vector view for [[maxSimTopK]]. floor on the widened double
    * is bit-identical across engines (float→double widening is exact,
    * ×10⁴ is one deterministic IEEE op), so every downstream dot/max/
    * sum is INTEGER arithmetic: the whole MaxSim score is exact and
    * hash-oracle-able, no rounding-key needed. */
  private def tokenQuant(c: Column): Column =
    transform(sequence(lit(0), lit(7)), i =>
      transform(slice(c, i * lit(8) + lit(1), lit(8)), v =>
        floor(v.cast("double") * 10000).cast("long")))

  /** Late-interaction (MaxSim) score between two token-vector arrays:
    * Σ_i max_j ⟨q_i, d_j⟩ — the ColBERT retrieval kernel (Khattab &
    * Zaharia 2020), computed entirely in Catalyst HOFs (aggregate /
    * transform / zip_with / array_max) so it stays codegen-friendly
    * and needs no UDF. */
  private def maxSimScore(qToks: Column, dToks: Column): Column =
    aggregate(qToks, lit(0L), (acc, qi) =>
      acc + array_max(transform(dToks, dj =>
        aggregate(zip_with(qi, dj, (a, b) => a * b), lit(0L), (s2, x) => s2 + x))))

  /** Multi-vector (late-interaction) retrieval: each embedding is a bag
    * of token-vectors; candidate score is MaxSim, top-k per query with
    * the deterministic (score DESC, vec_id) tiebreak. The gate reshapes
    * the 64-d corpus into 8×8 token bags ([[tokenQuant]]) — stand-in
    * plumbing for a real multi-vector encoder, with the scoring math
    * the real thing. Scale shape: candidates are BLOCKED (label here;
    * the IVF coarse bucket of the mean vector in production — the
    * [[annIvf]] composition), the query set rides a broadcast, the
    * corpus streams once; never all-pairs. Token count and dim are
    * per-array data, so ragged real tokenizations need no schema
    * change.
    *
    * CONTRACTUAL DOMAIN (VERDICT r14 #2): exact block-scoring is
    * Θ(Σ_label n_label · q_label) — under a FIXED label universe the
    * blocks grow linearly with the corpus and the `% queryMod` query set
    * grows too, so the pair mass is quadratic in n (measured: 20.2 M
    * pairs / 53 s at sf10 → 2.02 B pairs / >2400 s TIMEOUT at sf100).
    * The gate therefore pre-counts the mass with one linear aggregate
    * and REFUSES loudly above `maxScorePairs` (default 10⁸ ≈ 4 min of
    * scoring) instead of silently running n² — the nc ≤ 512 SemDeDup
    * precedent. Past the cap the scale paths are [[maxSimTopKRescore]]
    * (SAME query set and same-label contract, candidates IVF-routed,
    * scoring still exact — 174.6 s on the sf100 fixture where this
    * exact form timed out at >2400 s), [[maxSimTopKRescoreAdc]] (same
    * contract again with a PQ-ADC top-m prune ahead of the exact
    * kernel) and [[maxSimTopKIvf]] (fixed query set; 8.9 s warm r16 /
    * 17.2 s cold r14 on that fixture). */
  def maxSimTopK(s: SparkSession, d: String, queryMod: Int = 199,
      k: Int = 5): DataFrame =
    maxSimTopKVecs(Tables.embeddings(s, d), queryMod, k)

  /** [[maxSimTopK]] over a caller-supplied (vec_id, label, embedding)
    * frame — the spec entry point for planted corpora.
    *
    * NOTE (ADVICE r15 #4): the pair-mass guard is an EAGER one-row
    * aggregation job over (vec_id, label) that runs at call time, before
    * the returned frame is used — so this builder both costs a linear
    * scan up front and can throw IllegalArgumentException at plan-build
    * time. That is the documented refuse-loudly contract (failing
    * pointedly BEFORE committing to a quadratic block join); callers
    * composing the frame lazily should call this once and reuse the
    * result rather than re-invoking per downstream plan. */
  private[graft] def maxSimTopKVecs(e0: DataFrame, queryMod: Int = 199,
      k: Int = 5, maxScorePairs: Long = 100000000L): DataFrame = {
    // pair-mass guard: one column-pruned linear aggregate over
    // (vec_id, label) — cheap relative to scoring, and the only way to
    // fail POINTEDLY before committing to a quadratic block join
    val mass = Option(e0
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        sum(when(col("vec_id") % queryMod === 0, 1L).otherwise(0L)).as("nq"))
      .agg(sum(col("n") * col("nq")).as("pairs"))
      .head().getAs[java.lang.Long]("pairs")).map(_.longValue).getOrElse(0L)
    require(mass <= maxScorePairs,
      s"maxSimTopK: exact late-interaction scoring would evaluate $mass " +
      s"query-candidate pairs (cap $maxScorePairs): the label blocks have " +
      "outgrown the exact scorer's contractual domain. Use " +
      "maxSimTopKRescore for the SAME query set and same-label contract " +
      "with IVF-routed candidates exactly rescored (completes in minutes " +
      "on the sf100 fixture where this exact form exceeded 2400 s), " +
      "maxSimTopKIvf for a fixed query set (8.9 s warm r16 / 17.2 s cold " +
      "r14 on that fixture), or raise maxScorePairs deliberately.")
    val e = e0
      .select(col("vec_id"), col("label"), tokenQuant(col("embedding")).as("toks"))
    val q = e.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("label"), col("toks").as("q_toks"))
    val w = Window.partitionBy("q_id").orderBy(col("maxsim").desc, col("vec_id"))
    e.join(broadcast(q), Seq("label"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("maxsim", maxSimScore(col("q_toks"), col("toks")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("rank"), col("maxsim"))
  }

  /** The PRODUCTION MaxSim composition [[maxSimTopK]]'s scaladoc names:
    * a FIXED broadcast query set (vec_id < nQueries — linear in the
    * corpus, unlike the q_maxsim gate's `% 199` set that grows with n)
    * routed through the IVF coarse index — each query MaxSim-scores only
    * the nprobe probed buckets of its single-vector view, never a label
    * block. Cost per query is nprobe·√N candidate scorings; the corpus
    * pays one assignment pass (shared with [[annIvf]]'s `assignWith`).
    * Probe ranking reuses the round(cos, 6) key on the full embedding;
    * candidate ranking is the exact integer MaxSim (maxsim DESC, vec_id)
    * — both deterministic, so the gate carries a full DuckDB oracle. */
  def maxSimTopKIvf(s: SparkSession, d: String, nQueries: Int = 10,
      nprobe: Int = 2, k: Int = 5): DataFrame = {
    import s.implicits._
    val e = withNorm(s, d)
    val nc = centroidCount(embCount(s, d))
    val centArr = seedCentsD(s, d, nc)
    val cents = centArr.toSeq.toDF("c_id", "c_emb", "c_nrm")
    // suite-shared seed assignment (label dropped; bit-equal kernel)
    val assigned = memoAssigned(s, d).drop("label")
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("p_sim_key").desc, col("c_id"))
    val probes = q.join(broadcast(cents))
      .withColumn("p_sim_key",
        round(floatDot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("p_rank", row_number().over(wProbe))
      .where(col("p_rank") <= nprobe)
      .select(col("q_id"), tokenQuant(col("q_emb")).as("q_toks"),
        col("c_id").as("bucket"))
    val wTop = Window.partitionBy("q_id").orderBy(col("maxsim").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("maxsim", maxSimScore(col("q_toks"), tokenQuant(col("embedding"))))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("bucket"), col("rank"), col("maxsim"))
  }

  /** Exact-rescore MaxSim over the IVF candidate set — the production
    * answer for the workload [[maxSimTopK]]'s pair-mass guard refuses
    * (VERDICT r15 #2): the SAME query set (`% queryMod`, linear in the
    * corpus) and the same same-label top-k contract, but each query
    * scores only the nprobe IVF-probed buckets of its single-vector
    * view intersected with its label block. Candidate mass drops from
    * Σ n_label·q_label (quadratic under a fixed label universe — the
    * measured sf100 2.0 B-pair timeout) to ≈ queries·nprobe·√N /
    * |labels|, while the SCORING stays the exact integer
    * late-interaction kernel: recall is approximate (a true neighbor
    * hiding in an unprobed bucket is missed — the standard IVF trade),
    * the scores and ordering of what IS scored are exact. Routing
    * reuses [[annIvf]]'s seed-centroid scheme; the assignment pass here
    * carries `label` through (assignWith drops it). The probe frame
    * (queries × nprobe rows of 8×8 token bags) rides a broadcast —
    * ~30 MB at sf100's 25 K queries; a truly unbounded query set would
    * switch to a shuffle join on `bucket`, same plan shape. Every stage
    * is deterministic (round(cos, 6) probe keys, integer MaxSim,
    * vec_id tiebreaks) → full DuckDB oracle. */
  def maxSimTopKRescore(s: SparkSession, d: String, queryMod: Int = 199,
      nprobe: Int = 2, k: Int = 5): DataFrame = {
    import s.implicits._
    val e = withNorm(s, d)
    val n = embCount(s, d)
    val nc = centroidCount(n)
    val centArr = seedCentsD(s, d, nc)
    val cents = centArr.toSeq.toDF("c_id", "c_emb", "c_nrm")
    // the label-carrying assignment IS the suite-shared pass (r17): the
    // per-gate closure map this replaces was the memoAssigned build
    val assigned = memoAssigned(s, d)
    val q = e.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("p_sim_key").desc, col("c_id"))
    val probes = q.join(broadcast(cents))
      .withColumn("p_sim_key",
        round(floatDot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("p_rank", row_number().over(wProbe))
      .where(col("p_rank") <= nprobe)
      .select(col("q_id"), col("q_label"), tokenQuant(col("q_emb")).as("q_toks"),
        col("c_id").as("bucket"))
    val wTop = Window.partitionBy("q_id").orderBy(col("maxsim").desc, col("vec_id"))
    joinProbes(assigned, probes, n, queryMod, nprobe)
      .where(col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .withColumn("maxsim", maxSimScore(col("q_toks"), tokenQuant(col("embedding"))))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("bucket"), col("rank"), col("maxsim"))
  }

  /** The probe-frame join shared by [[maxSimTopKRescore]] /
    * [[maxSimTopKRescoreAdc]] — ADVICE r16 #3: the probe set grows
    * linearly with the corpus (n/queryMod queries × nprobe rows of 8×8
    * token bags, ~600 B each), so an unconditional broadcast hint would
    * eventually OOM the driver. While the estimated frame stays
    * executor-trivial (≤ 256 MB — an order of magnitude under the r16
    * sf100 measurement's headroom) it rides a broadcast; past that the
    * SAME rows flow through a shuffle hash join on `bucket` — output
    * identical, cost the documented production trade. */
  private def joinProbes(assigned: DataFrame, probes: DataFrame, n: Long,
      queryMod: Int, nprobe: Int, rowBytes: Long = 600L): DataFrame = {
    val probeBytes = (n / queryMod + 1L) * nprobe * rowBytes
    if (probeBytes <= (256L << 20)) assigned.join(broadcast(probes), Seq("bucket"))
    else assigned.join(probes.hint("shuffle_hash"), Seq("bucket"))
  }

  /** [[maxSimTopKRescore]] with a PQ-ADC top-m prune ahead of the exact
    * kernel (VERDICT r16 "Next" #3) — the IVFADC composition: routing and
    * the same-label contract are identical to the rescore twin, but each
    * query's probed candidates are first scored by the asymmetric-distance
    * proxy (4 table lookups per candidate against the per-query codeword
    * LUT — ~100× cheaper than the 8×8 integer late-interaction kernel)
    * and only the top `m` per query (round(adc, 6) DESC, vec_id — the
    * [[pqTopK]] rank key) reach the exact MaxSim scorer. The EMITTED
    * top-k therefore remains exactly scored and exactly ordered; what the
    * prune trades is membership recall (a true MaxSim neighbor with a
    * poor single-vector ADC proxy can fall outside the top m — measured
    * against [[maxSimTopKRescore]] in MaxSimSpec and SCALE.md). PQ
    * training/encoding reuse [[pqTrain]]/[[PqKernel.nearestL2]] with the
    * q_ann_pq parameterization (m = 4 subspaces × k = 16 codes, 3
    * seeded Lloyd rounds), so the whole chain — probes, codes, LUT sums,
    * both rank keys — is deterministic and carries a full DuckDB oracle
    * (the pqCtes + rescore CTEs composed). */
  def maxSimTopKRescoreAdc(s: SparkSession, d: String, queryMod: Int = 199,
      nprobe: Int = 2, k: Int = 5, m: Int = 32): DataFrame = {
    import s.implicits._
    val e = withNorm(s, d)
    val n = embCount(s, d)
    val nc = centroidCount(n)
    val centArr = seedCentsD(s, d, nc)
    val cents = centArr.toSeq.toDF("c_id", "c_emb", "c_nrm")
    val books = pqBooks(s, d, 4, 16, 3)
    val dSub = books(0)(0).length
    val bcB = s.sparkContext.broadcast(books)
    // the coarse assignment rides the suite-shared memo (r17); the PQ
    // encode is a narrow map over the checkpointed frame — the fused
    // assign+encode scan this replaces re-derived the assignment the
    // memo already holds, and the encode math is unchanged
    val assigned = memoAssigned(s, d)
      .as[(Long, Int, Array[Float], Double, Long)]
      .map { case (id, lab, emb, nrm, bucket) =>
        val bk = bcB.value
        val codes = Array.tabulate(bk.length)(sub =>
          PqKernel.nearestL2(bk(sub), emb.slice(sub * dSub, (sub + 1) * dSub)))
        (id, lab, emb, nrm, bucket, codes)
      }
      .toDF("vec_id", "label", "embedding", "nrm", "bucket", "codes")
    // per-query flattened ADC LUT: lut[sub * 16 + code] = <q_slice, codeword>
    val qlut = e.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (qid, emb) =>
        val bk = bcB.value
        val lut = new Array[Double](bk.length * bk(0).length)
        var sub = 0
        while (sub < bk.length) {
          val slice = emb.slice(sub * dSub, (sub + 1) * dSub)
          var code = 0
          while (code < bk(sub).length) {
            lut(sub * bk(sub).length + code) = PqKernel.dot(slice, bk(sub)(code))
            code += 1
          }
          sub += 1
        }
        (qid, lut)
      }
      .toDF("q_id", "lut")
    val q = e.where(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("p_sim_key").desc, col("c_id"))
    val probes = q.join(broadcast(cents))
      .withColumn("p_sim_key",
        round(floatDot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")), 6))
      .withColumn("p_rank", row_number().over(wProbe))
      .where(col("p_rank") <= nprobe)
      .select(col("q_id"), col("q_label"), tokenQuant(col("q_emb")).as("q_toks"),
        col("c_id").as("bucket"))
      .join(broadcast(qlut), Seq("q_id"))
    // ADC proxy (fixed sub order 0..3) → top-m prune → exact kernel
    val wAdc = Window.partitionBy("q_id")
      .orderBy(round(col("adc"), 6).desc, col("vec_id"))
    val wTop = Window.partitionBy("q_id").orderBy(col("maxsim").desc, col("vec_id"))
    joinProbes(assigned, probes, n, queryMod, nprobe, rowBytes = 1200L)
      .where(col("vec_id") =!= col("q_id") && col("label") === col("q_label"))
      .withColumn("adc", expr(
        """aggregate(sequence(0, 3), CAST(0 AS DOUBLE),
          |  (acc, s) -> acc + element_at(lut, s * 16 + element_at(codes, s + 1) + 1))"""
          .stripMargin))
      // slim the row BEFORE the rank shuffle: the per-query LUT and codes
      // have served their purpose — only the exact kernel's inputs ride
      .select(col("q_id"), col("vec_id"), col("bucket"), col("adc"),
        col("q_toks"), col("embedding"))
      .withColumn("a_rank", row_number().over(wAdc))
      .where(col("a_rank") <= m)
      .withColumn("maxsim", maxSimScore(col("q_toks"), tokenQuant(col("embedding"))))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("bucket"), col("rank"), col("maxsim"))
  }

  /** Sign-bit binary quantization ANN: each 64-d embedding packs into ONE
    * 64-bit LONG (bit i set iff component i > 0 — 32× smaller than the
    * float vector), candidates come from a Hamming-distance top-m scan
    * (`bit_count(sig XOR q_sig)` — three codegen'd integer ops per
    * comparison), and the m survivors are re-ranked by exact cosine. The
    * standard memory/recall trade for billion-vector corpora: the
    * signature table is what stays hot, the float vectors are read only
    * for the m rerank rows per query. Every stage is deterministic
    * (integer Hamming ties → vec_id; rerank keys on round(cos, 6)), so
    * the gate carries a full DuckDB oracle. Composes with [[annIvf]] the
    * same way [[maxSimTopKIvf]] does when even the linear signature scan
    * is too much. */
  def annBinary(s: SparkSession, d: String, nQueries: Int = 10, m: Int = 20,
      k: Int = 5): DataFrame = {
    val sigExpr = expr(
      """aggregate(sequence(0, 63), CAST(0 AS BIGINT), (acc, i) ->
        |  acc + IF(element_at(embedding, i + 1) > CAST(0 AS FLOAT),
        |           shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin)
    val e = withNorm(s, d).withColumn("sig", sigExpr)
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("sig").as("q_sig"))
    val wHam = Window.partitionBy("q_id").orderBy(col("hamming"), col("vec_id"))
    val cands = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("hamming", bit_count(col("sig").bitwiseXOR(col("q_sig"))))
      .withColumn("h_rank", row_number().over(wHam))
      .where(col("h_rank") <= m)
    val wTop = Window.partitionBy("q_id").orderBy(col("sim_key").desc, col("vec_id"))
    cands
      .withColumn("cos", floatDot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
      .withColumn("sim_key", round(col("cos"), 6))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select(col("q_id"), col("vec_id"), col("hamming"), col("rank"),
        round(col("cos"), 4).as("sim"))
  }

  /** Hybrid sparse+dense retrieval with reciprocal-rank fusion (Cormack
    * et al. 2009): per query document, a lexical candidate list (doc-to-
    * doc Okapi BM25 — the query's distinct terms scored against every
    * doc containing one) and a semantic list (cosine over the aligned
    * embedding) fuse by `Σ 1/(60 + rank)`, missing list ⇒ 0. The
    * per-term BM25 weights are INTEGER-quantized (`floor(w·10⁶)` LONG)
    * before the per-doc sum so the lexical score is order-independent —
    * the variable-term-count analog of [[graft.functions.TextAnalytics
    * .bm25]]'s fixed-column trick — and the fused ordering keys on
    * `floor(rrf·10¹²)` with a doc_id tiebreak, so the whole gate is
    * hash-oracle-able.
    *
    * Scale shape: query terms ride a broadcast, so the tf shuffle
    * carries query-term occurrences only; doc lengths are one partial
    * agg over the token stream; the dense side is the [[cosineTopK]]
    * broadcast scan (the [[annIvf]] bucket probe replaces it when the
    * corpus outgrows a linear scan); fusion joins two nList-bounded
    * rank lists. */
  def hybridRrf(s: SparkSession, d: String, nQueries: Int = 5, nList: Int = 20,
      kRrf: Int = 60, k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(graft.functions.TextAnalytics.tokens(col("text"))).as("term"))
    // r17: the doc-length side reads the text family's memoized score
    // table (identical integers to the dedicated groupBy(doc_id) pass
    // this used to run — the q_bm25 rewiring, same proof)
    val dl = graft.functions.TextAnalytics.docTokenCounts(s, d)
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("n_tokens"))
    val qterms = toks.where(col("doc_id") < nQueries)
      .select(col("doc_id").as("q_id"), col("term")).distinct()
    val tf = toks
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val wLex = Window.partitionBy("q_id").orderBy(col("lex_score").desc, col("doc_id"))
    val lex = broadcast(qterms)
      .join(tf, Seq("term"))
      .where(col("doc_id") =!= col("q_id"))
      .join(broadcast(df), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .withColumn("avgdl", col("n_tokens").cast("double") / col("n_docs"))
      .withColumn("idf", log(
        (col("n_docs").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("wq", floor(col("idf") * (col("tf") * (lit(k1) + lit(1.0)))
        / (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
        * 1000000.0).cast("long"))
      .groupBy("q_id", "doc_id").agg(sum("wq").as("lex_score"))
      .withColumn("r_lex", row_number().over(wLex))
      .where(col("r_lex") <= nList)
      .select(col("q_id"), col("doc_id"), col("r_lex"))
    // dense list = the memoized brute-force cosine top-k (identical
    // window key, queries and self-exclusion — r17: shares the one
    // corpus pass with q_cosine_topk and both recall truths)
    val sem = cosineTopK(s, d, nQueries, nList)
      .select(col("q_id"), col("vec_id").as("doc_id"), col("rank").as("r_sem"))
    val wR = Window.partitionBy("q_id").orderBy(col("rrf_key").desc, col("doc_id"))
    lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("r_lex", coalesce(col("r_lex"), lit(0)))
      .withColumn("r_sem", coalesce(col("r_sem"), lit(0)))
      .withColumn("rrf",
        when(col("r_lex") > 0, lit(1.0) / (col("r_lex") + kRrf)).otherwise(lit(0.0)) +
        when(col("r_sem") > 0, lit(1.0) / (col("r_sem") + kRrf)).otherwise(lit(0.0)))
      .withColumn("rrf_key", floor(col("rrf") * 1000000000000.0).cast("long"))
      .withColumn("rank", row_number().over(wR))
      .where(col("rank") <= k)
      .select(col("q_id"), col("doc_id"), col("rank"), col("r_lex"), col("r_sem"),
        round(col("rrf"), 6).as("rrf"))
  }
}
