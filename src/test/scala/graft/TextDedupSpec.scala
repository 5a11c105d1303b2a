package graft

import org.apache.spark.sql.functions._
import graft.functions.TextAnalytics
import graft.operators.{Dedup, Similarity}

/** LLM-pipeline operators: text analysis, dedup, similarity (north-star). */
class TextDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("exact dedup collapses identical texts, keeps lowest doc_id") {
    val df = Seq(
      (1L, "hello world", "en", 11L),
      (2L, "hello world", "en", 11L),
      (3L, "other text", "en", 10L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    df.createOrReplaceTempView("dedup_in")
    // same pipeline as Dedup.exact, applied to the fixture
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("text_hash").orderBy("doc_id")
    val out = df.withColumn("text_hash", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 3L))
  }

  test("fingerprint is token-order-insensitive but content-sensitive") {
    val df = Seq(
      (1L, "spark fast join"), (2L, "join fast spark"), (3L, "spark slow join")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      md5(array_join(array_sort(array_distinct(TextAnalytics.tokens(col("text")))), " ")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("fp")).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("text stats on sf0.001 are sane") {
    val stats = TextAnalytics.textStats(spark, sf)
    assert(stats.where(col("n_tokens") <= 0).count() == 0)
    assert(stats.where(col("alpha_ratio") < 0 || col("alpha_ratio") > 1).count() == 0)
    assert(stats.where(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() == 0)
  }

  test("ngram jaccard finds a planted near-duplicate and no self-pairs") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val near = base.replace("today", "tomorrow")
    val far  = "completely different words in this one nothing shared at all here"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    docs.cache()
    // reuse operator internals via a temp sf-like path is overkill; inline the same plan
    val toks = docs.select(col("doc_id"), TextAnalytics.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', slice(toks, i+1, 3)))"))).as("sh"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = toks.as("a").join(toks.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "a_n"), Seq("a_id"))
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "b_n"), Seq("b_id"))
      .withColumn("jaccard", col("shared").cast("double")
        / (col("a_n") + col("b_n") - col("shared")).cast("double"))
      .collect()
    val j12 = pairs.find(r => r.getAs[Long]("a_id") == 1L && r.getAs[Long]("b_id") == 2L)
    assert(j12.isDefined && j12.get.getAs[Double]("jaccard") > 0.5)
    assert(!pairs.exists(r => r.getAs[Long]("a_id") == r.getAs[Long]("b_id")))
    assert(!pairs.exists(r => r.getAs[Long]("b_id") == 3L && r.getAs[Double]("jaccard") > 0.2))
  }

  test("repetition stats flag a looping doc, pass a diverse one") {
    val df = Seq(
      // 10× the same bigram-heavy loop: top bigram dominates, trigrams repeat
      (1L, Seq.fill(10)("buy now").mkString(" ")),
      // diverse text: all bigrams/trigrams unique
      (2L, "the quick brown fox jumps over a lazy dog tonight"))
      .toDF("doc_id", "text")
    val out = TextAnalytics.repetitionStatsDocs(df)
      .orderBy("doc_id").collect()
    val looping = out(0)
    assert(looping.getAs[Boolean]("repetitive"))
    assert(looping.getAs[Double]("dup_trigram_ratio") > 0.5)
    // "now buy" appears 9x of 19 bigrams; "buy now" 10x
    assert(looping.getAs[Long]("top_bigram_n") == 10L)
    assert(looping.getAs[Long]("n_bigrams") == 19L)
    val diverse = out(1)
    assert(!diverse.getAs[Boolean]("repetitive"))
    assert(diverse.getAs[Double]("dup_trigram_ratio") == 0.0)
  }

  test("normalize+redact collapses whitespace, lowercases, masks emails and digit runs") {
    val df = Seq((1L, "Call  555-0199 \t or mail Bob.Smith+x@Example.COM  today"))
      .toDF("doc_id", "text")
    val out = df.select(
      TextAnalytics.normalizeRedactText(col("text")).as("r")).head.getString(0)
    assert(out == "call <num>-<num> or mail <email> today", s"got '$out'")
    // idempotent: re-normalizing the redacted form changes nothing
    val again = df.select(TextAnalytics.normalizeRedactText(
      TextAnalytics.normalizeRedactText(col("text"))).as("r")).head.getString(0)
    assert(again == out)
  }

  test("tfidf top terms: rare term outranks common term within a doc") {
    val out = TextAnalytics.tfidfTopTerms(spark, sf, topK = 3).cache()
    assert(out.count() > 0)
    // rank is 1..k per doc, and score is non-increasing in rank
    val bad = out.as("a").join(out.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.rank") < col("b.rank")
          && col("a.score") < col("b.score"))
    assert(bad.count() == 0)
    // a doc's #1 term never has the corpus-max df unless tf compensates:
    // weak sanity — the top-1 df is below the max df over all terms
    val maxDf = out.agg(max("df")).collect().head.getLong(0)
    val top1AtMaxDf = out.where(col("rank") === 1 && col("df") === maxDf
      && col("tf") === 1).count()
    assert(top1AtMaxDf == 0, s"tf=1 term with corpus-max df ranked #1 ($top1AtMaxDf docs)")
    out.unpersist()
  }

  test("banded minhash finds a planted near-duplicate, skips unrelated docs") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val near = base.replaceFirst("lazy", "sleepy")
    val far  = "completely different words appear in this unrelated document " +
      "nothing here overlaps with the animal sentence at all in any way"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashBandedDocs(docs, minJaccard = 0.5).collect()
    val p12 = pairs.find(r => r.getAs[Long]("a_id") == 1L && r.getAs[Long]("b_id") == 2L)
    assert(p12.isDefined, s"planted dup not found: ${pairs.mkString(",")}")
    assert(p12.get.getAs[Double]("est_jaccard") > 0.5)
    assert(!pairs.exists(r => r.getAs[Long]("b_id") == 3L || r.getAs[Long]("a_id") == 3L))
  }

  test("minhash signature estimate tracks exact Jaccard on identical docs") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val pairs = Dedup.minhashBandedDocs(docs).collect()
    assert(pairs.length == 1 && pairs.head.getAs[Double]("est_jaccard") == 1.0)
  }

  test("banded minhash estimate tracks exact Jaccard within sketch error") {
    // deterministic corpus: 10 base docs of 60 tokens, each paired with a
    // variant sharing a known prefix fraction. Exact shingle Jaccard is
    // computed in-test; the 128-hash estimate must land within ±0.15
    // (k=128 => stddev ~ sqrt(j(1-j)/128) <= 0.045, so 0.15 is >3 sigma)
    val words = (0 until 200).map(i => s"w$i")
    val docs = (0 until 10).flatMap { i =>
      val base = (0 until 60).map(j => words((i * 60 + j) % 200))
      val keep = 20 + i * 4 // 20..56 shared prefix tokens
      val variant = base.take(keep) ++ (0 until (60 - keep)).map(j => s"v${i}_$j")
      Seq((i * 2L, base.mkString(" ")), (i * 2L + 1, variant.mkString(" ")))
    }.toDF("doc_id", "text")
    def shingleSet(text: String): Set[String] =
      text.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val est = Dedup.minhashBandedDocs(docs, minJaccard = 0.05).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) -> r.getAs[Double]("est_jaccard"))
      .toMap
    (0 until 10).foreach { i =>
      val (a, b) = (i * 2L, i * 2L + 1)
      val (sa, sb) = (shingleSet(texts(a)), shingleSet(texts(b)))
      val exact = sa.intersect(sb).size.toDouble / sa.union(sb).size
      est.get((a, b)).foreach { e =>
        assert(math.abs(e - exact) < 0.15, s"pair $i: est $e vs exact $exact")
      }
      // high-overlap pairs must be FOUND (banding recall at j >= 0.5)
      if (exact >= 0.5) assert(est.contains((a, b)), s"pair $i (j=$exact) missed")
    }
  }

  test("spark.ml MinHashLSH variant finds the planted near-duplicate too") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val near = base.replaceFirst("lazy", "sleepy")
    val far  = "completely different words appear in this unrelated document " +
      "nothing here overlaps with the animal sentence at all in any way"
    val docs = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshDocs(docs).collect()
    assert(pairs.exists(r =>
      r.getAs[Long]("a_id") == 1L && r.getAs[Long]("b_id") == 2L),
      s"planted dup not found: ${pairs.mkString(",")}")
    assert(!pairs.exists(r => r.getAs[Long]("a_id") == 3L || r.getAs[Long]("b_id") == 3L))
  }

  test("simhash: identical docs share signature; near docs are close in Hamming") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally unrelated content with other words entirely different")
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("documents_fixture")
    // run the simhash expression directly on the fixture
    val sim = Dedup.simhash(spark, sf) // operator compiles/runs on real table
    assert(sim.count() > 0)
    val sigs = docs.select(col("doc_id"),
      expr("""aggregate(sequence(0, 63), 0L, (acc, i) -> acc + if(
              aggregate(transform(array_distinct(split(lower(trim(text)), '\\s+')), t -> xxhash64(t)), 0L,
                (v, h) -> v + if(((h >> i) & 1L) = 1L, 1L, -1L)) > 0L,
              shiftleft(1L, i), 0L))""").as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sig")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 8)
  }

  test("connected components: path graph, isolated node, multi-component") {
    // path 1-2-3 (diameter 2 — needs >1 propagation round), pair 10-11,
    // isolated node 20
    val edges = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id")
    val labels = Dedup.connectedComponents(edges, nodes)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connected components: edge endpoints absent from nodes are still labeled") {
    // the node list misses 3 and 11 entirely — the universe must be
    // nodes ∪ endpoints, not bare nodes (ADVICE r4)
    val edges = Seq((2L, 3L), (10L, 11L)).toDF("a", "b")
    val nodes = Seq(2L, 10L).toDF("id")
    val labels = Dedup.connectedComponents(edges, nodes)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(labels == Map(2L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L))
  }

  test("connected components works on string node ids") {
    val edges = Seq(("b", "c"), ("c", "a")).toDF("x", "y")
    val nodes = Seq("a", "b", "c", "z").toDF("id")
    val labels = Dedup.connectedComponents(edges, nodes)
      .collect().map(r => r.getAs[String]("id") -> r.getAs[String]("comp")).toMap
    assert(labels == Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "z"))
  }

  test("log-round components agree with min-label propagation on every fixture") {
    def both(edges: org.apache.spark.sql.DataFrame, nodes: org.apache.spark.sql.DataFrame) = {
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.get(0) -> r.get(1)).toMap
      (toMap(Dedup.connectedComponents(edges, nodes)),
        toMap(Dedup.connectedComponentsLogRounds(edges, nodes)))
    }
    // path + pair + isolated (the existing fixture)
    val (a1, b1) = both(Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("a", "b"),
      Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("id"))
    assert(a1 == b1)
    // endpoints absent from nodes
    val (a2, b2) = both(Seq((2L, 3L), (10L, 11L)).toDF("a", "b"),
      Seq(2L, 10L).toDF("id"))
    assert(a2 == b2)
    // string ids
    val (a3, b3) = both(Seq(("b", "c"), ("c", "a")).toDF("x", "y"),
      Seq("a", "b", "c", "z").toDF("id"))
    assert(a3 == b3)
    // long path (diameter 40 — the shape min-label needs 40 rounds for
    // and large-star/small-star needs ~log rounds)
    val path = (0L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val (a4, b4) = both(path, Seq(0L).toDF("id"))
    assert(a4 == b4 && a4.values.toSet == Set(0L))
    // seeded random graph: 60 nodes, 45 edges — multiple components
    val rnd = new scala.util.Random(42)
    val re = Seq.fill(45)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    val (a5, b5) = both(re.toDF("a", "b"), (0L until 60L).toDF("id"))
    assert(a5 == b5)
  }

  test("dedup clusters keep one canonical doc per planted near-dup group") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = a.replace("today", "tomorrow")          // near-dup of a
    val c = a.replace("again and again", "time after time") // near-dup of a (and b transitively)
    val far = "completely different words in this one nothing shared at all here"
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, far)).toDF("doc_id", "text")
    val sh = Dedup.rarePostings(docs, maxDf = 100L).cache()
    val pairs = Dedup.ngramJaccardFromPostings(sh, Dedup.docSizes(docs), threshold = 0.12)
      .select("a_id", "b_id")
    val labels = Dedup.connectedComponents(pairs, docs.select("doc_id"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    sh.unpersist()
    assert(labels(1L) == 1L && labels(2L) == 1L && labels(3L) == 1L)
    assert(labels(4L) == 4L)
  }

  test("decontamination flags the eval-copied doc, passes the clean doc") {
    val leaked = "the quick brown fox jumps over the lazy dog again and again"
    val train = Seq(
      (1L, leaked),                                                        // verbatim eval copy
      (2L, "completely different words in this one nothing shared at all"),
      (3L, leaked + " with a short unique suffix appended here")           // partial overlap
    ).toDF("doc_id", "text")
    val eval = Seq((100L, leaked)).toDF("doc_id", "text")
    val out = Dedup.decontaminateDocs(train, eval)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("contamination"), r.getAs[Boolean]("contaminated"))).toMap
    assert(out(1L)._1 == 1.0 && out(1L)._2)
    assert(out(2L)._1 == 0.0 && !out(2L)._2)
    assert(out(3L)._1 > 0.0 && out(3L)._1 < 1.0)
  }

  test("corpus clean: quality gate, exact dup, and near-dup each remove their doc") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, a, "en", a.length.toLong),                                   // keeper (cluster min)
      (2L, a, "en", a.length.toLong),                                   // exact dup of 1 -> dropped
      (3L, a.replace("today", "tomorrow"), "en", a.length.toLong),      // near-dup of 1 -> dropped
      (4L, "@@@ ### $$$ %%% ^^^ &&&", "en", 23L),                       // alpha_ratio 0 -> dropped
      (5L, "too few", "en", 7L),                                        // n_tokens < 5 -> dropped
      (6L, "completely different words in this one nothing shared at all here", "en", 65L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val kept = graft.etl.CorpusPipeline.corpusCleanDocs(docs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 6L))
  }

  test("chunking: overlap carries between windows, coverage is total, short docs stay whole") {
    val words = (1 to 100).map(i => s"w$i")
    val df = Seq(
      (1L, words.mkString(" ")), // 100 tokens -> 2 chunks at 64/16
      (2L, "just three tokens"))
      .toDF("doc_id", "text")
    val out = TextAnalytics.chunkDocs(df, chunkTokens = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = out.filter(_.getAs[Long]("doc_id") == 1L)
    assert(d1.length == 2) // ceil((100-16)/48) = 2
    val c0 = d1(0).getAs[String]("chunk_text").split(" ")
    val c1 = d1(1).getAs[String]("chunk_text").split(" ")
    assert(c0.length == 64 && d1(0).getAs[Long]("n_chunk_tokens") == 64L)
    assert(c1.length == 52 && d1(1).getAs[Long]("n_chunk_tokens") == 52L)
    // stride 48: chunk 1 starts at token 49, overlapping the last 16 of chunk 0
    assert(c0.drop(48).toSeq == c1.take(16).toSeq)
    // union of chunks covers every token in order
    assert((c0 ++ c1.drop(16)).toSeq == words.map(_.toLowerCase))
    val d2 = out.filter(_.getAs[Long]("doc_id") == 2L)
    assert(d2.length == 1 && d2(0).getAs[Long]("n_chunk_tokens") == 3L
      && d2(0).getAs[String]("chunk_text") == "just three tokens")
  }

  test("corpus stats tiers partition the corpus and totals add up") {
    val stats = graft.etl.CorpusPipeline.corpusStats(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(stats.map(_.getAs[Long]("n_docs")).sum == docs.count())
    stats.foreach { r =>
      assert(Set("hi", "mid", "low")(r.getAs[String]("tier")))
      assert(r.getAs[Long]("min_tokens") <= r.getAs[Long]("max_tokens"))
      val avg = r.getAs[Double]("avg_tokens")
      assert(avg >= r.getAs[Long]("min_tokens") && avg <= r.getAs[Long]("max_tokens"))
    }
  }

  test("int8 quantization bounds the range and the reconstruction error") {
    val e = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector edge case
      (3L, Array(3.0f, -3.0f, 1.5f, 2.9f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8Vecs(e).orderBy("vec_id").collect()
    out.foreach { r =>
      assert(r.getAs[Long]("q_min") >= -127L && r.getAs[Long]("q_max") <= 127L)
      val scale = r.getAs[Double]("scale")
      // half-step reconstruction bound: |x - q*scale/127| <= scale/254
      assert(r.getAs[Double]("max_abs_err") <= scale / 254.0 + 1e-9)
    }
    val zero = out(1)
    assert(zero.getAs[Double]("scale") == 0.0 && zero.getAs[Long]("q_sum") == 0L
      && zero.getAs[Double]("max_abs_err") == 0.0)
    // the max-|x| element always quantizes to ±127 exactly
    assert(out(2).getAs[Long]("q_min") == -127L && out(2).getAs[Long]("q_max") == 127L)
  }

  test("cosine top-k: nearest neighbor of a vector among orthogonal ones is the aligned one") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.where(col("vec_id") === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val out = vecs.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("embedding")))
      .orderBy(col("cos").desc).select("vec_id").as[Long].collect()
    assert(out.head == 1L)
  }

  test("IVF ANN on sf0.001 returns valid ranks per query") {
    val out = Similarity.annIvf(spark, sf, nQueries = 3, k = 3).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rows =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.length))
    }
  }
}
